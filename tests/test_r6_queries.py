"""Contract tests for the round-6 queries: mixture-sample manifest
semantics and the IVF+int8 compressed index composition.

(Streaming exact dedup's restart contract lives in
tests/test_warehouse_streaming.py; ANN recall gates in
tests/test_ann_recall.py.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_mixture_sample_copies_bounded_by_weight(spark):
    """Every doc draws floor(w) or floor(w)+1 copies of its source weight —
    the hash-Bernoulli contract — and the manifest enumerates copy_id
    densely from 0."""
    qs = all_queries()
    weights = {
        r.source: r.resample_weight
        for r in qs["doc_mixture_weights"].fn(spark, SF_DIR).collect()
    }
    rows = qs["doc_mixture_sample"].fn(spark, SF_DIR).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, copies in per_doc.items():
        w = weights[copies[0].source]
        n = copies[0].n_copies
        assert n in (math.floor(w), math.floor(w) + 1), (doc_id, w, n)
        assert sorted(c.copy_id for c in copies) == list(range(n))


def test_mixture_sample_hits_expected_source_totals(spark):
    """In expectation each source contributes weight × n_docs copies; with
    deterministic hashes the realized total must sit within a generous
    binomial band (±5 σ) of that — a systematic bias (e.g. hashing the
    wrong salt, comparing against the wrong threshold) lands far outside."""
    qs = all_queries()
    wrows = qs["doc_mixture_weights"].fn(spark, SF_DIR).collect()
    got = {
        r["source"]: r["total"]
        for r in qs["doc_mixture_sample"]
        .fn(spark, SF_DIR)
        .groupBy("source")
        .agg(F.count("*").alias("total"))
        .collect()
    }
    for r in wrows:
        frac = r.resample_weight - math.floor(r.resample_weight)
        expected = r.n_docs * r.resample_weight
        sigma = math.sqrt(r.n_docs * frac * (1 - frac))
        assert abs(got.get(r.source, 0) - expected) <= 5 * sigma + 1, (
            r.source, expected, got.get(r.source, 0)
        )


def test_mixture_sample_is_replay_stable(spark):
    """Zero RNG: two independent runs produce the identical manifest."""
    fn = all_queries()["doc_mixture_sample"].fn
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert a == b


@pytest.mark.parametrize("name", ["emb_ivfpq_topk", "emb_pq_topk"])
def test_compressed_index_output_contract(spark, name):
    """Per query: ranks dense from 1, exact score ordering with id
    tie-breaks, and cos_q present as the compressed-domain score — the
    shared contract of both compressed indexes (int8 and true PQ)."""
    rows = all_queries()[name].fn(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q  # the query set is non-empty
    for qid, nbrs in by_q.items():
        assert [r.rank for r in nbrs] == list(range(1, len(nbrs) + 1))
        key = [(-r.cos_sim, r.neighbor_id) for r in nbrs]
        assert key == sorted(key), qid
        assert all(r.cos_q is not None for r in nbrs)


def test_gopher_rules_fire_on_crafted_texts(spark):
    """Each rule must trip on a text built to violate exactly it, and a
    NULL text must yield NULL keep (unscoreable, not silently decided)."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.text import (
        gopher_quality_flags,
    )

    good = "the quick brown fox jumps over a lazy dog and runs to town " * 5
    rows = [
        (0, good),                                        # passes every rule
        (1, "too short"),                                 # word count floor
        (2, ("a " * 60).strip()),                         # mean len < 3
        (3, ("the of " + "#tag " * 20) * 3),              # symbol ratio
        (4, "\n".join("- item the of and" for _ in range(20))),   # bullets
        (5, "\n".join("the of and more..." for _ in range(20))),  # ellipsis
        (6, ("123 456 789 " * 20) + "the of"),            # alpha fraction
        (7, ("zork blee crumb " * 30).strip()),           # no stopwords
        (8, None),                                        # unscoreable
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[0].keep is True
    assert got[1].rule_word_count is False
    assert got[2].rule_mean_len is False
    assert got[3].rule_symbol_ratio is False
    assert got[4].rule_bullets is False
    assert got[5].rule_ellipsis is False
    assert got[6].rule_alpha is False
    assert got[7].rule_stopwords is False
    for d in range(1, 8):
        assert got[d].keep is not True, d
    assert got[8].keep is None


def test_hard_negatives_semantic_contract(spark):
    """The positive must share the query's label, the negative must not,
    and each must be the COSINE ARGMAX within its label class — verified
    against a NumPy brute-force recomputation with the same 6-decimal
    rounding and (cos desc, id asc) tie-break."""
    import numpy as np

    vecs, labels = {}, {}
    for row in (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    ):
        vecs[row.vec_id] = np.asarray(row.embedding, dtype=np.float64)
        labels[row.vec_id] = row.label

    def brute_best(query_id, want_same_label):
        qv = vecs[query_id]
        best = None
        for nid, nv in vecs.items():
            if nid == query_id:
                continue
            if (labels[nid] == labels[query_id]) != want_same_label:
                continue
            cos = round(
                float(qv @ nv)
                / (float(np.linalg.norm(qv)) * float(np.linalg.norm(nv))),
                6,
            )
            if best is None or (-cos, nid) < best:
                best = (-cos, nid)
        return -best[0], best[1]

    rows = all_queries()["emb_hard_negatives"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert labels[r.pos_id] == r.query_label, r
        assert labels[r.neg_id] != r.query_label, r
        pos_cos, pos_id = brute_best(r.query_id, want_same_label=True)
        neg_cos, neg_id = brute_best(r.query_id, want_same_label=False)
        assert (r.pos_id, r.pos_cos) == (pos_id, pos_cos), r
        assert (r.neg_id, r.neg_cos) == (neg_id, neg_cos), r


def test_leakage_audit_is_cross_split_subset_of_near_dups(spark):
    """Every audited pair must (a) cross the split boundary and (b) be a
    pair the near-dup detector reports, with the identical jaccard —
    composition must not invent or rescore pairs."""
    qs = all_queries()
    dups = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in qs["doc_minhash_neardup"].fn(spark, SF_DIR).collect()
    }
    splits = {
        r.doc_id: r.split
        for r in qs["doc_split_assign"].fn(spark, SF_DIR).collect()
    }
    rows = qs["split_leakage_audit"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.split_a != r.split_b, r
        assert splits[r.doc_a] == r.split_a and splits[r.doc_b] == r.split_b
        assert dups[(r.doc_a, r.doc_b)] == r.jaccard, r
    # completeness: every cross-split near-dup pair is reported
    expected = sum(
        1 for (a, b) in dups if splits[a] != splits[b]
    )
    assert len(rows) == expected


def test_scd2_history_is_a_valid_type2_dimension(spark):
    """The Kimball contracts: versions dense from 1, half-open intervals
    chain exactly (valid_to == next valid_from), exactly one open current
    row per user, adjacent versions change state, and the history
    conserves the user's event count."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    per_user_events = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    rows = all_queries()["scd2_user_state"].fn(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(per_user_events)
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        assert [h.version for h in hist] == list(range(1, len(hist) + 1))
        assert sum(h.n_events for h in hist) == per_user_events[uid]
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from  # intervals chain, half-open
            assert a.valid_from < b.valid_from
            assert a.state != b.state  # a run ended because state changed
            assert not a.is_current
        assert hist[-1].is_current and hist[-1].valid_to is None


def test_incremental_rollup_merge_algebra_holds(spark):
    """Every per-type row must prove merged-states == full-recompute, and
    the merged counts must conserve the events table."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = all_queries()["incremental_rollup"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.merge_consistent for r in rows)
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert r.min_value <= r.max_value


def test_scd2_snapshots_match_brute_force_reconstruction(spark):
    """Every (snapshot, state) census must equal a brute-force as-of scan
    of the history table, and each snapshot's total must equal the users
    already present by then (once seen, a user is always in some state)."""
    from collections import Counter

    qs = all_queries()
    hist = qs["scd2_user_state"].fn(spark, SF_DIR).collect()
    rows = qs["scd2_snapshots"].fn(spark, SF_DIR).collect()
    by_snap: dict = {}
    for r in rows:
        by_snap.setdefault(r.snapshot_ts, Counter())[r.state] = r.n_users
    assert by_snap, "snapshot grid must intersect the corpus window"
    first_seen = {}
    for h in hist:
        if h.version == 1:
            first_seen[h.user_id] = h.valid_from
    for snap_ts, census in by_snap.items():
        expected = Counter(
            h.state
            for h in hist
            if h.valid_from <= snap_ts
            and (h.valid_to is None or h.valid_to > snap_ts)
        )
        assert census == expected, snap_ts
        assert sum(census.values()) == sum(
            1 for t in first_seen.values() if t <= snap_ts
        )


def test_incremental_distinct_booleans_hold_at_higher_cardinality(spark):
    """Both in-plan proofs must hold where the sketch actually estimates:
    run the same merge-vs-direct-vs-exact comparison over the larger
    sf0.01 user population, not just the fixture corpus. (The r9 sf0.1
    sweep proved merged==direct equality false in general — sparse→dense
    promotion differs by route — so the contract is now both estimates
    independently within HLL_REL_TOLERANCE of exact.)"""
    rows = all_queries()["incremental_distinct"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        assert r.merged_within_tolerance, r
        assert r.direct_within_tolerance, r
