"""ANN quality gates: approximate indexes must stay close to exact top-k.

Hash-parity proves each ANN query matches ITS oracle (which mirrors the
approximation); these tests bound the approximation itself — an index
change that tanks recall would otherwise stay "correct".
"""

from __future__ import annotations

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
