"""End-to-end pretraining-data pipeline: raw corpus → packed token bins.

The full funnel a 100 TB text pipeline runs, composed from this engine's
operators — each stage is a lazy DataFrame transform (one exception: the
near-dup clustering stage materializes its pair graph and label table,
since iterative label propagation needs a driver-side convergence loop),
so Catalyst sees one plan per materialization and stages prune each
other's work:

1. quality gate        (length / stopword / punctuation heuristics)
2. language filter     (n-gram stopword language ID)
3. repetition filter   (Gopher-style duplicate-bigram fraction)
4. exact dedup         (keep canonical doc per content hash)
5. near-dup removal    (MinHash+LSH pairs → connected components,
                        keep one doc per cluster)
6. semantic dedup      (SemDeDup over the embedding column:
                        cluster-bounded cosine, keep lowest id)
7. decontamination     (drop docs sharing an 8-gram with the eval set)
8. deterministic sample(md5 Bernoulli — replayable, no RNG)
   + mixture rebalance (DoReMi-style per-source weights over the
                        surviving corpus, applied as the deterministic
                        hash-Bernoulli copy manifest)
9. chunking            (overlapping fixed-token context windows)
   + sequence packing  (shard-local cumulative token bins)

Run: python examples/pretraining_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")

from data_engineering_datawarehousingandetlpipeline_spark.functions.hashing import (
    u32_hash,
)
from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    dedup as dd,
    similarity as sim,
    text as tx,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)

QUALITY_MIN = 0.3
LANGS = ("en",)
MAX_DUP_BIGRAM_FRACTION = 0.8
SEMDEDUP_THRESHOLD = 0.3  # calibrated to the synthetic embedding corpus
SEMDEDUP_CLUSTERS = 16
DECON_WIDTH = 8
SAMPLE_RATE = 0.9
CHUNK_SIZE = 64
CHUNK_STRIDE = 48
PACK_CAPACITY = 512
PACK_SHARD_DOCS = 100


def build_pipeline(
    docs: DataFrame, bench: DataFrame, embs: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Each stage as a named lazy DataFrame; later stages build on earlier.

    ``bench`` is the eval/benchmark set to decontaminate against (tiny —
    its n-gram postings broadcast). ``embs`` is the doc-aligned embedding
    table (vec_id == doc_id); when absent the semantic-dedup stage is a
    pass-through.
    """
    text = F.col("text")

    # 1-2: row-local scoring — one scan computes quality + language
    scored = docs.select(
        "doc_id",
        "text",
        tx.quality_score(text).alias("quality"),
        tx.predicted_lang(text).alias("lang_pred"),
    )
    gated = scored.filter(
        (F.col("quality") >= QUALITY_MIN) & F.col("lang_pred").isin(*LANGS)
    )

    # 3: repetition — aggregation-based signal, joined back by doc_id
    bigrams = gated.select(
        "doc_id", F.explode(tx.word_shingles(text, 2)).alias("bg")
    )
    rep = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            (
                F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
                / F.sum("c")
            ).alias("dup_frac")
        )
    )
    clean = (
        gated.join(rep, "doc_id")
        .filter(F.col("dup_frac") <= MAX_DUP_BIGRAM_FRACTION)
        .select("doc_id", "text")
    )

    # 4: exact dedup (keep canonical doc per content hash)
    deduped = dd.dedup_keep_canonical(clean)

    # 5: near-dup clusters → keep the cluster representative
    pairs = dd.minhash_near_dup_pairs(deduped, threshold=0.9)
    clusters = dd.near_dup_clusters(deduped, pairs)
    survivors = deduped.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
    )

    # 6: semantic dedup — SemDeDup over the embedding column, restricted
    # to the docs still alive (cluster-bounded cosine, keep lowest id).
    # Anti-join on the PRUNED ids: a surviving doc with no embedding row
    # was never compared to anything and must pass through, not vanish.
    if embs is not None:
        emb_alive = embs.join(
            survivors.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        sem_pruned = (
            sim.semantic_dedup(
                emb_alive,
                threshold=SEMDEDUP_THRESHOLD,
                n_centroids=SEMDEDUP_CLUSTERS,
            )
            .filter(F.col("pruned"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        semantic = survivors.join(sem_pruned, "doc_id", "left_anti")
    else:
        semantic = survivors

    # 7: decontamination — any shared 8-gram with the benchmark set
    def posts(d: DataFrame, alias: str) -> DataFrame:
        return d.select(
            F.col("doc_id").alias(alias),
            F.explode(
                F.array_distinct(tx.word_shingles(F.col("text"), DECON_WIDTH))
            ).alias("ngram"),
        )

    contaminated = (
        posts(semantic, "doc_id")
        .join(F.broadcast(posts(bench, "bench_id")), "ngram")
        .select("doc_id")
        .distinct()
    )
    decontaminated = semantic.join(contaminated, "doc_id", "left_anti")

    # 8: deterministic hash sample (replayable at any scale — no RNG)
    sampled = decontaminated.filter(
        u32_hash(F.col("doc_id").cast("string"))
        < F.lit(int(SAMPLE_RATE * (1 << 32)))
    )

    # 8b: mixture rebalance — DoReMi-style per-source weights over the
    # SURVIVING corpus (weights computed after filtering, since filters
    # change the mixture), applied as the deterministic hash-Bernoulli
    # copy manifest. The manifest is the loader's sampling plan; chunking
    # below still runs per distinct doc (a loader replays a doc's chunks
    # n_copies times).
    from data_engineering_datawarehousingandetlpipeline_spark.functions.hashing import (
        u32_hash as _u32,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
        _mixture_weights,
    )

    with_source = sampled.join(docs.select("doc_id", "source"), "doc_id")
    weights = _mixture_weights(with_source).select("source", "resample_weight")
    w = F.col("resample_weight")
    mix_h = _u32(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    rebalanced = (
        with_source.join(F.broadcast(weights), "source")
        .select(
            "doc_id",
            "source",
            (
                F.floor(w).cast("bigint")
                + F.when(
                    mix_h < (w - F.floor(w)) * F.lit(4294967296.0), 1
                ).otherwise(0)
            ).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 0)
    )

    # 9a: chunk surviving docs into overlapping context windows
    chunked = tx.chunk_documents(
        sampled, chunk_size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )

    # 9b: pack into token bins, shard-local
    sized = sampled.select(
        "doc_id", tx.token_count(F.col("text")).alias("n_tokens")
    )
    packed = tx.pack_token_bins(
        sized, capacity=PACK_CAPACITY, shard_docs=PACK_SHARD_DOCS
    )

    return {
        "gated": gated,
        "clean": clean,
        "deduped": deduped,
        "survivors": survivors,
        "semantic": semantic,
        "decontaminated": decontaminated,
        "sampled": sampled,
        "rebalanced": rebalanced,
        "chunked": chunked,
        "packed": packed,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pretraining-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    # the benchmark stand-in: every 50th doc (disjoint from the train side)
    bench = docs.filter((F.col("doc_id") % 50) == 0)
    train = docs.filter((F.col("doc_id") % 50) != 0)

    stages = build_pipeline(train, bench, embs)
    n = train.count()
    print(f"documents          : {n}")
    for name in (
        "gated", "clean", "deduped", "survivors", "semantic",
        "decontaminated", "sampled",
    ):
        m = stages[name].count()
        print(f"{name:<19}: {m}  (-{n - m})")
        n = m
    reb = stages["rebalanced"].agg(
        F.count("*"), F.sum("n_copies"), F.countDistinct("source")
    ).collect()[0]
    print(
        f"rebalanced         : {reb[0]} docs -> {reb[1]} copies "
        f"across {reb[2]} sources (mixture flattened)"
    )
    chunked = stages["chunked"]
    nc, ct = chunked.agg(
        F.count("*"), F.sum("n_chunk_tokens")
    ).collect()[0]
    print(f"chunked            : {nc} windows of <= {CHUNK_SIZE} tokens ({ct} total)")
    packed = stages["packed"]
    bins = packed.select("shard", "bin_in_shard").distinct().count()
    toks = packed.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"packed             : {toks} tokens into {bins} bins of {PACK_CAPACITY}")


if __name__ == "__main__":
    main()
