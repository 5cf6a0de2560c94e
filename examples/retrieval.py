"""Retrieval stack demo: BM25, dense cosine, and hybrid RRF fusion.

The three rankings a retrieval-backed data pipeline serves — lexical
(BM25 over pinned postings), dense (cosine over the embedding column),
and their reciprocal-rank fusion (no score calibration needed) — run as
more-like-this queries for a handful of example documents, printing how
the modalities agree and where fusion changes the answer.

Run: python examples/retrieval.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    similarity as sim,
)
from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    text as tx,
)
from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
    RRF_POOL,
    RRF_QUERY_DOCS,
    bm25_ranking,
    q_retrieval_rrf,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-demo")

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")

    qterms = docs.filter(F.col("doc_id") < RRF_QUERY_DOCS).select(
        F.col("doc_id").cast("int").alias("query_id"),
        F.explode(F.array_distinct(tx.tokens(F.col("text")))).alias("term"),
    )
    lexical = bm25_ranking(docs, qterms, RRF_POOL, exclude_self=True)
    print("\n== BM25 more-like-this (lexical) ==")
    lexical.orderBy("query_id", "rank").show(3 * RRF_POOL, truncate=False)

    dense = sim.cosine_top_k(
        embs, embs.filter(F.col("vec_id") < RRF_QUERY_DOCS), k=RRF_POOL
    )
    print("== Dense cosine more-like-this ==")
    dense.show(3 * RRF_POOL, truncate=False)

    fused = q_retrieval_rrf(spark, sf_dir)
    print("== Hybrid RRF fusion (top-5 per query) ==")
    fused.show(50, truncate=False)

    rows = fused.collect()
    both = sum(1 for r in rows if r.rank_dense is not None and r.rank_lex is not None)
    single = len(rows) - both
    print(
        f"fused results backed by BOTH modalities: {both}/{len(rows)} "
        f"(single-modality survivors: {single})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
