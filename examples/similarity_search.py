"""Embedding similarity search: exact vs LSH vs IVF, with measured recall.

The three index strategies a 100 TB vector pipeline chooses between —
each scores a different fraction of the corpus per query:

1. brute-force cosine   (exact; corpus streams past broadcast queries)
2. hyperplane LSH       (one bucket per query — fastest, lowest recall)
3. k-means IVF          (probe the 4/16 nearest clusters; sampled
                         training via train_fraction at real scale)

Run: python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    similarity as sim,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)


def _neighbors(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="similarity-search")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = corpus.filter(F.col("vec_id") < 8)
    # size the hash to the corpus — fixed plane counts either starve
    # buckets (tiny corpus, no recall) or flood them (huge corpus, O(n²))
    n_planes = sim.planes_for_corpus(corpus.count())
    print(f"corpus-sized LSH: {n_planes} planes ({2 ** n_planes} buckets)")

    strategies = {
        "exact": lambda: sim.cosine_top_k(corpus, queries, k=5),
        "lsh": lambda: sim.cosine_top_k_lsh(corpus, queries, k=5, n_planes=n_planes),
        "ivf": lambda: sim.cosine_top_k_ivf(
            corpus, queries, k=5, train_fraction=0.5, n_probe=8
        ),
        # compressed serving indexes: int8 codes under the IVF probe set
        # (4x smaller), and true PQ (64x smaller; worst-case corpus — a
        # deeper re-rank buys recall back, see plans/extensions.PQ_RERANK)
        "ivfpq": lambda: sim.cosine_top_k_ivfpq(
            corpus, queries, k=5, train_fraction=0.5, n_probe=8
        ),
        "pq": lambda: sim.cosine_top_k_pq(
            corpus, queries, dim=64, k=5, rerank=75
        ),
    }
    results = {}
    for name, build in strategies.items():
        t0 = time.perf_counter()
        results[name] = _neighbors(build().collect())
        print(f"{name:6s}: {time.perf_counter() - t0:.2f}s")

    exact = results["exact"]
    total = sum(len(v) for v in exact.values())
    for name in ("lsh", "ivf", "ivfpq", "pq"):
        hits = sum(len(exact[q] & results[name].get(q, set())) for q in exact)
        print(f"recall@5 {name}: {hits}/{total} = {hits / total:.2f}")
    print("OK")


if __name__ == "__main__":
    main()
