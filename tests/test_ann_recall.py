"""ANN quality gates: approximate indexes must stay close to exact top-k.

Hash-parity proves each ANN query matches ITS oracle (which mirrors the
approximation); these tests bound the approximation itself — an index
change that tanks recall would otherwise stay "correct".
"""

from __future__ import annotations

import pytest

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.01"


def _neighbor_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(spark, approx_name: str) -> float:
    qs = all_queries()
    exact = _neighbor_sets(qs["emb_cosine_topk"].fn(spark, SF_DIR).collect())
    approx = _neighbor_sets(qs[approx_name].fn(spark, SF_DIR).collect())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total


def test_ivf_recall_at_5(spark):
    """k-means IVF with 4/16 probes must reach recall@5 ≥ 0.8 vs exact."""
    assert _recall(spark, "emb_ivf_topk") >= 0.8


def test_ivf_sampled_training_keeps_recall(spark):
    """At warehouse scale the quantizer trains on a deterministic hash
    sample, not full-corpus Lloyd passes. Sampled centroids are noisier,
    so the recall/cost dial moves to n_probe (8/16 instead of 4/16 here
    — on this tiny structureless corpus a half sample is only ~250
    vectors); the bar stays the same ≥ 0.8."""
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.operators.similarity import (
        cosine_top_k_ivf,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
        _embs,
    )

    qs = all_queries()
    exact = _neighbor_sets(qs["emb_cosine_topk"].fn(spark, SF_DIR).collect())
    embs = _embs(spark, SF_DIR)
    approx = _neighbor_sets(
        cosine_top_k_ivf(
            embs, embs.filter(F.col("vec_id") < 8), n_probe=8,
            train_fraction=0.5,
        ).collect()
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.8, (hits, total)


def test_near_dup_bucket_occupancy_bounded(spark):
    """No hyperplane-LSH bucket may hold a large share of the corpus — a
    hot bucket makes the within-bucket self-join quadratic. Checked per
    table across all OR-amplification tables."""
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.operators import (
        similarity as sim,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
        ANN_PLANES,
        EMBED_DIM,
        EMBED_TABLES,
        _embs,
    )

    embs = _embs(spark, SF_DIR)
    n = embs.count()
    for t in range(EMBED_TABLES):
        planes = [
            sim.hyperplane(t * ANN_PLANES + b, EMBED_DIM)
            for b in range(ANN_PLANES)
        ]
        top = (
            embs.select(sim.lsh_bucket(F.col("embedding"), planes).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert top / n <= 0.10, (t, top, n)


def test_planes_scale_with_corpus():
    """The plane count must grow with the corpus (fixed planes = quadratic
    buckets at scale): ~doubling the corpus adds a plane."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.similarity import (
        planes_for_corpus,
    )

    assert planes_for_corpus(2_000) == 5
    assert planes_for_corpus(2_000_000) == 15
    assert planes_for_corpus(2_000_000_000) == 25
    assert planes_for_corpus(100) == 4  # floor


def test_near_dup_planes_derive_from_corpus_size(spark):
    """Deployment path of the near-dup operator: without a pinned
    ``n_planes``, the plane count must be derived from the corpus size
    (explicit ``corpus_rows`` hint, else a one-time count), so a bigger
    corpus gets more planes end-to-end — the property that keeps bucket
    occupancy (and the within-bucket self-join) bounded at 100 TB."""
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.operators import (
        similarity as sim,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
        _embs,
    )

    embs = _embs(spark, SF_DIR)

    def bucket_legs(df):
        # each hyperplane contributes one CASE WHEN leg to the bucket
        # expression — count them in the analyzed plan as the end-to-end
        # observable of the resolved plane count.
        return df._jdf.queryExecution().analyzed().toString().count("CASE WHEN")

    small = sim.embedding_near_dup_pairs(embs, corpus_rows=1_000)
    large = sim.embedding_near_dup_pairs(embs, corpus_rows=1_000_000)
    assert bucket_legs(large) > bucket_legs(small)

    # no hint at all: a one-time sizing count (limit-probed, so an
    # over-limit refusal never pays a full scan) sizes the index the same
    # way the equivalent explicit hint would — and warns about the scan
    with pytest.warns(UserWarning, match="eager sizing count"):
        counted = sim.embedding_near_dup_pairs(embs)
    hinted = sim.embedding_near_dup_pairs(embs, corpus_rows=embs.count())
    assert bucket_legs(counted) == bucket_legs(hinted)

    # past the auto-count limit the bare form fails LOUDLY instead of
    # silently re-scanning a warehouse-sized corpus on every invocation
    with pytest.warns(UserWarning, match="eager sizing count"):
        with pytest.raises(ValueError, match="auto_count_limit"):
            sim.embedding_near_dup_pairs(embs, auto_count_limit=10)


def test_ivfpq_recall_at_5(spark):
    """The compressed index (IVF + int8 codes, exact re-rank of the top-3k
    survivors) must hold the same recall@5 ≥ 0.8 bar as uncompressed IVF —
    the go/no-go behind serving quantized vectors."""
    assert _recall(spark, "emb_ivfpq_topk") >= 0.8


def test_ivfpq_rerank_recovers_exact_scores(spark):
    """Every emitted cos_sim must equal the exact cosine the brute-force
    baseline computes for that (query, neighbor) pair — re-ranking restores
    full precision, so compression can only affect WHICH candidates
    surface, never their reported scores."""
    qs = all_queries()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in qs["emb_cosine_topk"].fn(spark, SF_DIR).collect()
    }
    for r in qs["emb_ivfpq_topk"].fn(spark, SF_DIR).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:  # pair also present in the exact top-k
            assert r["cos_sim"] == exact[key], key


def test_pq_recall_at_5(spark):
    """True PQ at 64× compression on a uniform-random corpus — the
    provable worst case for codebook compression (no cluster structure) —
    must still clear ≥ 0.8 recall@5 at its registered re-rank budget
    (PQ_RERANK; see plans/extensions.py for the measured dial)."""
    assert _recall(spark, "emb_pq_topk") >= 0.8


def test_rrf_ann_recall_at_5_vs_exact_fusion(spark):
    """The ANN-served hybrid ranking must stay close to the exact fusion:
    recall@5 of retrieval_rrf_ann's fused top-5 vs retrieval_rrf's ≥ 0.8
    (hash-parity proves each matches ITS oracle; this bounds the IVF
    approximation inside the fusion)."""
    qs = all_queries()

    def fused_sets(name):
        out: dict[int, set[int]] = {}
        for r in qs[name].fn(spark, SF_DIR).collect():
            out.setdefault(r["query_id"], set()).add(r["doc_id"])
        return out

    exact = fused_sets("retrieval_rrf")
    approx = fused_sets("retrieval_rrf_ann")
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert total > 0 and hits / total >= 0.8, (hits, total)
