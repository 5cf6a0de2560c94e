"""r16 optimization profiling: time sub-stages of the heavy bench queries.

Usage: python tools/profile_r16.py <target>
Targets: minhash, ivf, simhash, ngram
Each sub-stage runs through the noop sink, 2 warm-ups + best-of-3,
matching bench.py's steady-state methodology.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators import dedup as dd
from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    similarity as sim,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, name, df_fn):
    for _ in range(2):
        df_fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(3):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(name)
        df_fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:8.3f}  {name}", flush=True)
    return best


def main():
    target = sys.argv[1]
    spark = get_spark(app_name=f"profile-{target}")
    if target == "minhash":
        docs = load_table(spark, SF_DIR, "documents")
        timed(spark, "0 scan only", lambda: docs)
        timed(
            spark,
            "1 token_hash_array",
            lambda: docs.select(
                F.col("doc_id"), dd.token_hash_array(F.col("text")).alias("h")
            ),
        )
        timed(spark, "2 signatures", lambda: dd.minhash_signatures(docs))
        timed(
            spark,
            "3 banded",
            lambda: dd.lsh_band_hashes(dd.minhash_signatures(docs)),
        )

        def cand():
            sigs = dd.minhash_signatures(docs)
            banded = dd.lsh_band_hashes(sigs)
            return (
                banded.alias("x")
                .join(
                    banded.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.band_hash") == F.col("y.band_hash"))
                    & (F.col("x.doc") < F.col("y.doc"))
                    & dd.size_prune_cond(F.col("x.n"), F.col("y.n"), 0.9),
                )
                .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
                .distinct()
            )

        timed(spark, "4 candidates", cand)
        timed(
            spark,
            "5 full pairs",
            lambda: dd.minhash_near_dup_pairs(docs, threshold=0.9),
        )
    elif target == "ivf":
        embs = load_table(spark, SF_DIR, "embeddings")
        queries = embs.filter(F.col("vec_id") < 8)
        timed(
            spark,
            "1 kmeans (2 iter)",
            lambda: sim.kmeans_centroids(embs, 16, 2),
        )

        def assigned():
            cents = sim.kmeans_centroids(embs, 16, 2).withColumn(
                "cnorm", sim.norm(F.col("cvec"))
            )
            return sim.ivf_assign(embs, cents)

        timed(spark, "2 kmeans+assign", assigned)
        timed(
            spark,
            "3 full ivf_topk",
            lambda: sim.cosine_top_k_ivf(embs, queries, k=5, n_centroids=16,
                                         n_probe=4, iterations=2),
        )
    elif target == "simhash":
        docs = load_table(spark, SF_DIR, "documents")
        timed(spark, "1 fingerprints", lambda: dd.simhash_fingerprints(docs))
        timed(
            spark, "2 full pairs", lambda: dd.simhash_near_dup_pairs(docs)
        )
    elif target == "ngram":
        docs = load_table(spark, SF_DIR, "documents")
        timed(
            spark,
            "1 full jaccard_pairs",
            lambda: dd.jaccard_pairs(
                docs, threshold=0.01, shingle_width=3, max_doc_freq=5
            ),
        )
    else:
        raise SystemExit(f"unknown target {target}")


if __name__ == "__main__":
    main()
