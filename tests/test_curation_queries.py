"""Contract tests for the round-6 curation family (plans/curation.py).

Oracle parity (test_oracle_parity.py) already proves value equality; these
pin the SEMANTIC contracts a hash match alone can't express — per-cluster
keep uniqueness, histogram mass conservation, estimator bounds — plus the
determinism the zero-RNG design promises.
"""

from __future__ import annotations

import math

import pytest

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def _rows(spark, name):
    return SPECS[name].fn(spark, SF_DIR).collect()


def test_dsir_covers_every_document_with_finite_weights(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = _rows(spark, "doc_dsir_weights")
    assert len(rows) == docs.count()
    for r in rows:
        assert r.dsir_logratio is not None
        assert math.isfinite(r.dsir_logratio)
        assert r.n_tokens >= 1


def test_dsir_weights_are_replay_stable(spark):
    a = _rows(spark, "doc_dsir_weights")
    b = _rows(spark, "doc_dsir_weights")
    assert a == b


def test_cluster_keep_selects_exactly_one_max_quality_member(spark):
    rows = _rows(spark, "doc_cluster_keep")
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1, f"cluster {cid}: {len(keeps)} keeps"
        best_q = max(m.quality for m in members)
        assert keeps[0].quality == best_q
        # deterministic tiebreak: lowest id among the max-quality members
        assert keeps[0].doc_id == min(
            m.doc_id for m in members if m.quality == best_q
        )


def test_cluster_stats_mass_conserves_the_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = _rows(spark, "dedup_cluster_stats")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.n_excess_copies == (r.cluster_size - 1) * r.n_clusters


def test_cluster_stats_excess_equals_what_dedup_would_remove(spark):
    """The histogram's excess-copy total must equal corpus − #clusters —
    the exact row count canonical dedup (one keep per cluster) drops."""
    stats = _rows(spark, "dedup_cluster_stats")
    keep = _rows(spark, "doc_cluster_keep")
    n_clusters = sum(r.n_clusters for r in stats)
    assert sum(r.n_excess_copies for r in stats) == len(keep) - n_clusters
    assert n_clusters == sum(1 for r in keep if r.keep)


def test_vocab_drift_returns_topk_with_finite_scores(spark):
    from data_engineering_datawarehousingandetlpipeline_spark.plans.curation import (
        DRIFT_TOP_TERMS,
    )

    rows = _rows(spark, "doc_vocab_drift")
    assert 0 < len(rows) <= DRIFT_TOP_TERMS
    zs = [abs(r.z_score) for r in rows]
    assert zs == sorted(zs, reverse=True)  # ranked by |z|
    for r in rows:
        assert math.isfinite(r.z_score)
        assert r.y_tgt + r.y_rest > 0


def test_source_overlap_estimates_respect_set_algebra(spark):
    rows = _rows(spark, "source_overlap")
    assert rows, "synthetic corpus has cross-source near-dups"
    for r in rows:
        assert r.source_a < r.source_b
        assert 1 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0
        assert r.jaccard <= r.containment <= 1.0
        # containment = common / smaller set, by definition
        assert r.containment == pytest.approx(
            r.n_common / min(r.n_a, r.n_b), abs=1e-6
        )


def test_source_overlap_sketch_is_a_true_subsample(spark):
    """The 1/MOD sketch must be a subset of the full gram sets: every
    sketched pair's common count is ≤ the unsketched count, and sketch
    sizes are ≤ full sizes (deterministic hash-mod, no replacement)."""
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.operators import (
        text as tx,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.plans.curation import (
        SRC_OVERLAP_WIDTH,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full_sizes = {
        r.source: r.n
        for r in docs.select(
            "source",
            F.explode(
                F.array_distinct(tx.word_shingles(F.col("text"), SRC_OVERLAP_WIDTH))
            ).alias("gram"),
        )
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in _rows(spark, "source_overlap"):
        assert r.n_a <= full_sizes[r.source_a]
        assert r.n_b <= full_sizes[r.source_b]


def test_perplexity_scores_finite_and_rank_repetitive_text_likely(spark):
    """Every document must score with finite avg_logprob < 0 and its full
    token count; replay-stable (zero RNG); and the model must behave like
    a unigram LM: a doc made only of the corpus's most frequent tokens
    scores a higher (less negative) average than one of rare tokens —
    checked via the relative ranking of the per-doc scores against a
    Python recomputation on a small sample."""
    import math
    from collections import Counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    rows = _rows(spark, "doc_perplexity")
    assert len(rows) == len(docs)
    for r in rows:
        assert r.avg_logprob is not None and math.isfinite(r.avg_logprob)
        assert r.avg_logprob < 0
        assert r.n_tokens >= 1
    assert rows == _rows(spark, "doc_perplexity")  # replay-stable

    # Python recomputation on the first 20 docs: same model, same
    # smoothing, and the SAME tokenizer semantics as tx.tokens —
    # re.split(r"\s+") mirrors Java's \s (str.split() would differ on
    # Unicode whitespace and on empty text, where Spark yields [""]).
    import re

    def toks(t):
        if t is None:
            return []
        return re.split(r"\s+", t.strip().lower())

    ctf = Counter()
    for d in docs:
        ctf.update(toks(d.text))
    n_corpus, v = sum(ctf.values()), len(ctf)
    by_id = {r.doc_id: r for r in rows}
    for d in docs[:20]:
        tks = toks(d.text)
        if not tks:
            continue  # NULL text contributes nothing on either engine
        expect = sum(
            round(math.log((ctf[t] + 1) / (n_corpus + v)), 7) for t in tks
        ) / len(tks)
        got = by_id[d.doc_id].avg_logprob
        assert abs(got - expect) < 1e-5, (d.doc_id, got, expect)
