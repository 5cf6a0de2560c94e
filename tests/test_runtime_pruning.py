"""Runtime-filter evidence: dynamic partition pruning + bloom-filter joins.

At warehouse scale the fact scan is the dominant cost, and the selective
predicate usually lives on the *dimension* side of a join — invisible to
static pushdown. Spark closes that gap with two runtime mechanisms, both
of which this engine's plans rely on at 100 TB:

- **Dynamic partition pruning** (DPP): when a partitioned fact joins a
  filtered dim on the partition column, the dim's matched keys become a
  runtime ``PartitionFilters`` subquery on the fact scan, so only the
  surviving partitions are read at all. This is what makes the
  warehouse's ``dt``-partitioned layout (warehouse/store.py) pay off for
  dim-driven queries, not just for literal date predicates.
- **Runtime bloom filters**: for unpartitioned shuffle joins, the
  creation side's join keys are folded into a bloom filter that is
  pushed to the application side as a ``might_contain`` guard, dropping
  non-matching fact rows before the shuffle instead of after it.

Neither mechanism is assumed — both are pinned here against the real
session configuration (``session.get_spark``), so a config regression
that silently disables them fails CI rather than surfacing as a 100×
scan blow-up in production.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_dynamic_partition_pruning_prunes_warehouse_fact_scan(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fact = events.withColumn("dt", F.to_date(F.col("ts").cast("timestamp")))
    fact.write.mode("overwrite").partitionBy("dt").parquet(str(tmp_path / "fact"))
    facts = spark.read.parquet(str(tmp_path / "fact"))

    # dim with a non-key predicate: 3 kept dates out of ~30 — the fact
    # scan must shrink to those 3 partitions at runtime
    dim = (
        facts.select("dt")
        .distinct()
        .orderBy("dt")
        .limit(3)
        .withColumn("keep", F.lit(1))
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    dims = spark.read.parquet(str(tmp_path / "dim"))

    joined = (
        facts.join(dims.filter(F.col("keep") == 1), "dt")
        .groupBy("dt")
        .agg(F.count("*").alias("n"))
    )
    plan = _formatted(joined)
    assert "dynamicpruningexpression" in plan.lower(), (
        "partitioned fact scan is not dynamically pruned by the dim filter"
    )

    kept = [r["dt"] for r in dims.collect()]
    static = (
        facts.filter(F.col("dt").isin(kept)).groupBy("dt").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, static.collect()))


def test_runtime_bloom_filter_guards_unpartitioned_shuffle_join(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    facts = spark.read.parquet(str(tmp_path / "fact"))
    dim = (
        facts.select("user_id").distinct().orderBy("user_id").limit(20)
        .withColumn("seg", F.lit("a"))
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    dims = spark.read.parquet(str(tmp_path / "dim"))

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    ), "runtime bloom filters must stay enabled in the engine session"

    # At test scale the fact side is far below the 10 GiB application-side
    # threshold and the dim would broadcast; drop both thresholds to
    # exercise the exact plan shape a 100 TB fact ⋈ 100 MB dim produces.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = (
            facts.join(dims.filter(F.col("seg") == "a"), "user_id")
            .groupBy("seg")
            .agg(F.count("*").alias("n"))
        )
        plan = _formatted(joined)
        assert "might_contain" in plan, "application side is not bloom-guarded"
        assert "bloom_filter_agg" in plan, "creation side builds no bloom filter"
        shuffled = sorted(map(tuple, joined.collect()))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    broadcast = (
        facts.join(F.broadcast(dims.filter(F.col("seg") == "a")), "user_id")
        .groupBy("seg")
        .agg(F.count("*").alias("n"))
    )
    assert shuffled == sorted(map(tuple, broadcast.collect()))
