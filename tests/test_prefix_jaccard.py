"""Equivalence + plan-shape gates for the prefix-filtered exact Jaccard join.

``jaccard_pairs_prefix`` (SSJoin/PPJoin prefix filtering) must produce
EXACTLY the pairs of ``jaccard_pairs`` — same (doc_a, doc_b) sets, same
jaccard values — across thresholds, shingle widths, df-caps, and
adversarial corpora, so that choosing between them is a pure cost
decision per corpus shape (measured r13: postings wins on the
replica-dense bench corpus, prefix is the declared alternative for
natural low-duplication vocabularies — see the operator docstring).
The interesting failure modes are boundary ones: prefix length at
exact-integer t·d (float ceil), ties in the (df, shingle) global order,
capped-vocabulary set-size recomputation, and documents whose every
shingle is hot.
"""

from __future__ import annotations

import itertools
import random

import pytest

from data_engineering_datawarehousingandetlpipeline_spark.operators import dedup as dd

VOCAB = [f"w{i}" for i in range(40)]


def _random_corpus(seed: int, n_docs: int = 50) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs: list[tuple[int, str]] = []
    doc_id = 0
    while doc_id < n_docs:
        base = rng.sample(VOCAB, rng.randint(6, 20))
        for _ in range(min(rng.randint(1, 4), n_docs - doc_id)):
            words = list(base)
            for _ in range(rng.randint(0, 2)):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            docs.append((doc_id, " ".join(words)))
            doc_id += 1
    return docs


def _pairs(df_out) -> dict[tuple[int, int], float]:
    return {(r.doc_a, r.doc_b): r.jaccard for r in df_out.collect()}


def _assert_equivalent(spark, docs, threshold, width=1, cap=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = _pairs(
        dd.jaccard_pairs(
            df, threshold=threshold, shingle_width=width, max_doc_freq=cap
        )
    )
    pref = _pairs(
        dd.jaccard_pairs_prefix(
            df, threshold=threshold, shingle_width=width, max_doc_freq=cap
        )
    )
    assert set(pref) == set(base), (
        f"pair sets differ at t={threshold} w={width} cap={cap}: "
        f"only_base={set(base) - set(pref)} only_prefix={set(pref) - set(base)}"
    )
    for key, j in pref.items():
        assert abs(j - base[key]) < 1e-12, (key, j, base[key])


@pytest.mark.parametrize("threshold", [0.0, 0.2, 0.5, 0.8, 0.9, 1.0])
def test_prefix_join_equals_postings_join_across_thresholds(spark, threshold):
    _assert_equivalent(spark, _random_corpus(seed=11), threshold)


def test_prefix_join_equals_postings_join_bigram_shingles(spark):
    _assert_equivalent(spark, _random_corpus(seed=23), 0.6, width=2)


@pytest.mark.parametrize("cap", [1, 3, 8])
def test_prefix_join_equals_postings_join_with_df_cap(spark, cap):
    # hot-vocabulary corpus: a boilerplate phrase in most docs, so the cap
    # actually prunes and the capped set sizes differ from the raw ones
    rng = random.Random(5)
    docs = []
    for i in range(40):
        words = ["terms", "of", "service"] + rng.sample(VOCAB, rng.randint(4, 10))
        docs.append((i, " ".join(words)))
    _assert_equivalent(spark, docs, 0.5, cap=cap)


def test_prefix_length_boundary_is_lossless(spark):
    """t·d exactly integer (t = 0.9, d = 10): fp-rounded ceil would cut
    the prefix to 1 shingle and lose the J = 0.9 pair whose single
    differing shingle is each side's rarest (prefix) element. Construct
    exactly that: 11-shingle union, 9 shared, one unique per side, and
    the unique shingles globally rarest so they fill the 1-slot prefix
    if the bound is computed wrong."""
    shared = [f"s{i}" for i in range(9)]
    # 'aaa'/'zzz' appear once each -> rarest under (df, shingle) order
    docs = [
        (0, " ".join(shared + ["aaa"])),
        (1, " ".join(shared + ["zzz"])),
        # padding docs that reuse the shared shingles so they are NOT rare
        *[(i, " ".join(shared)) for i in range(2, 6)],
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # true J(0,1) = 9/11 = 0.8181... ; J(0, padding) = 9/10 = 0.9
    out = _pairs(dd.jaccard_pairs_prefix(df, threshold=0.9, shingle_width=1))
    base = _pairs(dd.jaccard_pairs(df, threshold=0.9, shingle_width=1))
    assert set(out) == set(base)
    assert (0, 2) in out and abs(out[(0, 2)] - 0.9) < 1e-12


def test_identical_documents_survive_threshold_one(spark):
    docs = [(0, "x y z"), (1, "x y z"), (2, "x y q")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = _pairs(dd.jaccard_pairs_prefix(df, threshold=1.0, shingle_width=1))
    assert set(out) == {(0, 1)} and out[(0, 1)] == 1.0


def test_prefix_candidate_volume_is_pruned(spark):
    """The point of the rework: at t = 0.9 the candidate join must fan
    out over far fewer rows than the full postings self-join. Both index
    counts come from the operator's OWN ``prefix_index`` plan (same
    shingle_width on both paths), and the operator's final output is
    pinned to the postings-join baseline — no hand-rebuilt lookalike,
    no vacuous assertions."""
    from pyspark.sql import functions as F

    docs = _random_corpus(seed=31, n_docs=80)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    width = 1

    prefix, surviving = dd.prefix_index(
        df, threshold=0.9, shingle_width=width
    )
    prefix_rows = prefix.count()
    n_postings = surviving.count()  # uncapped: the full posting list
    n_docs = df.count()

    # structural bound, measured on the operator's real index: each doc
    # indexes floor((1-t)*n) + 1 shingles at t = 0.9
    max_prefix_rows = int(0.1 * n_postings) + n_docs + 1
    assert prefix_rows <= max_prefix_rows, (prefix_rows, max_prefix_rows)
    assert prefix_rows < n_postings / 3  # the index really shrank

    # candidate volume through the operator's index vs the full postings
    # self-join it replaces (identical join predicate shape, no size
    # prune on either side so the comparison isolates the prefix effect)
    def _self_join_pairs(postings):
        return (
            postings.alias("a")
            .join(
                postings.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select("a.doc", "b.doc")
            .distinct()
            .count()
        )

    full_pairs = _self_join_pairs(surviving)
    prefix_pairs = _self_join_pairs(prefix.select("doc", "shingle"))
    assert 0 < prefix_pairs < full_pairs, (prefix_pairs, full_pairs)

    # and the pruned join still produces EXACTLY the baseline output
    base = _pairs(dd.jaccard_pairs(df, threshold=0.9, shingle_width=width))
    pref = _pairs(
        dd.jaccard_pairs_prefix(df, threshold=0.9, shingle_width=width)
    )
    assert set(pref) == set(base)
    for key, j in pref.items():
        assert abs(j - base[key]) < 1e-12, (key, j, base[key])
