"""End-to-end training-data dedup ladder over the documents corpus.

The five rungs a 100 TB text pipeline climbs, cheapest first — each rung
removes what it can so the next (more expensive) one sees less data:

1. exact hash dedup          (one shuffle on the content hash)
2. normalized exact dedup    (case/punct/whitespace canonicalization)
3. MinHash+LSH near-dup      (banded candidates, exact-Jaccard verify)
4. connected components      (pair graph → one canonical doc per cluster)
5. SemDeDup                  (embedding k-means clusters, cosine within
                              cluster only — catches paraphrases no
                              token-level rung can see)

Run: python examples/dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_engineering_datawarehousingandetlpipeline_spark.operators import dedup as dd
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dedup-ladder")
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    print(f"documents: {n_total}")

    # rung 0: AUDIT before deduping — which feeds duplicate which, and is
    # the corpus still adding new content in arrival order? (the r13
    # curation queries; at 100 TB both are bounded-shuffle audits)
    from data_engineering_datawarehousingandetlpipeline_spark.plans.curation import (
        q_doc_ngram_novelty,
        q_source_dup_matrix,
    )

    top_dup = (
        q_source_dup_matrix(spark, sf_dir)
        .orderBy(F.col("n_pairs").desc(), "source_a", "source_b")
        .limit(3)
        .collect()
    )
    for r in top_dup:
        print(
            f"rung 0 dup-matrix : {r.source_a} x {r.source_b}: "
            f"{r.n_pairs} near-dup pairs (avg J {r.avg_jaccard})"
        )
    tail_novelty = (
        q_doc_ngram_novelty(spark, sf_dir)
        .orderBy(F.col("doc_id").desc())
        .limit(max(n_total // 10, 1))
        .agg(F.round(F.avg("novelty"), 4).alias("tail_novelty"))
        .collect()[0]
    )
    print(f"rung 0 novelty    : newest-decile mean novelty {tail_novelty.tail_novelty}")

    # rung 1: exact duplicates
    exact = dd.exact_dedup_groups(docs)
    n_exact = exact.count()
    print(f"rung 1 exact      : {n_total - n_exact} removed -> {n_exact} distinct")

    # rung 2: survivors of rung 1, re-grouped after canonicalization
    survivors = dd.dedup_keep_canonical(docs)
    norm = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), r"[^\w\s]", ""), r"\s+", " "
            )
        )
    )
    n_norm = survivors.select(norm.alias("h")).distinct().count()
    print(f"rung 2 normalized : {n_exact - n_norm} more removed -> {n_norm}")

    # rung 3: MinHash+LSH near-dup pairs on the survivors
    pairs = dd.minhash_near_dup_pairs(survivors, threshold=0.9)
    n_pairs = pairs.count()
    print(f"rung 3 near-dup   : {n_pairs} candidate-verified pairs")

    # rung 4: components -> one canonical doc per cluster
    clusters = dd.near_dup_clusters(survivors, pairs)
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"rung 4 clusters   : {n_clusters} clusters (keep one doc each)")
    kept = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    n_kept = kept.count()
    print(f"token-level corpus: {n_kept} of {n_total} documents")

    # rung 5: semantic dedup over the doc-aligned embedding column
    from data_engineering_datawarehousingandetlpipeline_spark.operators import (
        similarity as sim,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    emb_alive = embs.join(kept.select(F.col("doc_id").alias("vec_id")), "vec_id")
    sem = sim.semantic_dedup(emb_alive, threshold=0.3, n_centroids=16)
    # anti-join on PRUNED ids: a kept doc with no embedding row was never
    # compared and passes through rather than vanishing
    sem_pruned = sem.filter(F.col("pruned")).select(
        F.col("vec_id").alias("doc_id")
    )
    final = kept.join(sem_pruned, "doc_id", "left_anti")
    n_final = final.count()
    print(f"rung 5 semantic   : {n_kept - n_final} more removed -> {n_final}")
    print(f"final corpus      : {n_final} of {n_total} documents")
    print("OK")


if __name__ == "__main__":
    main()
