"""Composition test for the end-to-end pretraining funnel (examples/).

Pins the invariants that make the composed pipeline trustworthy: each
stage only removes rows (never invents or duplicates), the whole funnel
is deterministic across runs (hash sampling, no RNG anywhere), the
decontaminated set shares no 8-gram with the benchmark side, and packing
conserves every surviving token.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "examples")

from pretraining_pipeline import PACK_CAPACITY, build_pipeline  # noqa: E402

from data_engineering_datawarehousingandetlpipeline_spark.operators import (  # noqa: E402
    text as tx,
)
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (  # noqa: E402
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _split(spark):
    docs = load_table(spark, SF_DIR, "documents")
    embs = load_table(spark, SF_DIR, "embeddings")
    return (
        docs.filter((F.col("doc_id") % 50) != 0),
        docs.filter((F.col("doc_id") % 50) == 0),
        embs,
    )


def test_funnel_only_removes_and_is_deterministic(spark):
    train, bench, embs = _split(spark)
    stages = build_pipeline(train, bench, embs)
    order = ["gated", "clean", "deduped", "survivors", "semantic",
             "decontaminated", "sampled"]
    ids = {name: set(r.doc_id for r in stages[name].select("doc_id").collect())
           for name in order}
    train_ids = set(r.doc_id for r in train.select("doc_id").collect())
    prev = train_ids
    for name in order:
        assert ids[name] <= prev, f"{name} added rows"
        prev = ids[name]
    # replay: identical output (deterministic hashing end to end)
    replay = build_pipeline(train, bench, embs)
    assert set(r.doc_id for r in replay["sampled"].select("doc_id").collect()) == ids["sampled"]
    # chunk windows cover every sampled doc and nothing else
    chunk_ids = set(r.doc_id for r in stages["chunked"].select("doc_id").collect())
    assert chunk_ids == ids["sampled"]


def test_decontaminated_set_is_actually_clean(spark):
    train, bench, embs = _split(spark)
    decon = build_pipeline(train, bench, embs)["decontaminated"]

    def grams(df):
        return df.select(
            F.explode(
                F.array_distinct(tx.word_shingles(F.col("text"), 8))
            ).alias("ngram")
        )

    leftover = grams(decon).join(grams(bench), "ngram").count()
    assert leftover == 0


def test_packing_conserves_tokens_and_respects_capacity_layout(spark):
    train, bench, embs = _split(spark)
    stages = build_pipeline(train, bench, embs)
    sampled_tokens = (
        stages["sampled"]
        .select(tx.token_count(F.col("text")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    packed = stages["packed"].collect()
    assert sum(r.n_tokens for r in packed) == sampled_tokens
    for r in packed:
        # the cumulative layout: every doc STARTS in the bin its offset says
        assert r.bin_in_shard == r.offset_tokens // PACK_CAPACITY
