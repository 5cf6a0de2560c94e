"""Salted two-stage aggregation must equal the direct groupBy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators.skew import (
    salted_agg,
)
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)
from tests.conftest import SF_DIR


def test_salted_agg_matches_direct(spark):
    events = load_table(spark, SF_DIR, "events")
    salted = salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n": ("event_id", "count"),
            "s": (F.col("value").cast("decimal(18,4)"), "sum"),
            "lo": ("value", "min"),
            "hi": ("value", "max"),
        },
        salt_col="event_id",
        buckets=8,
    )
    direct = events.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    lhs = {r["event_type"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in salted.collect()}
    rhs = {r["event_type"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in direct.collect()}
    assert lhs == rhs


def test_salted_agg_rejects_non_algebraic(spark):
    events = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(events, ["event_type"], {"m": ("value", "avg")}, salt_col="event_id")


def test_salted_join_matches_plain_join(spark):
    """Inner and left salted joins must equal the plain join row-for-row
    (salting is semantically invisible): every big row carries one salt
    value matching exactly one replica of its dimension row."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.skew import (
        salted_join,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    dim = events.groupBy("event_type").agg(F.count("*").alias("type_total"))
    # left join with a gap: drop one type from the dimension so unmatched
    # big rows must survive exactly once with NULL stats
    dim_gap = dim.filter(F.col("event_type") != "click")
    for how, d in (("inner", dim), ("left", dim_gap)):
        got = salted_join(
            events, d, on=["event_type"], salt_col="event_id", how=how
        )
        expect = events.join(d, "event_type", how)
        assert got.count() == expect.count(), how
        assert (
            got.exceptAll(expect).count() == 0
            and expect.exceptAll(got).count() == 0
        ), how


def test_salted_join_spreads_hot_keys_without_broadcast(spark):
    """The scale property: with broadcast off (neither side fits at real
    scale), the join must be a SortMergeJoin keyed on (join key, salt) —
    each hot key's rows spread over `buckets` reducers instead of one."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.skew import (
        salted_join,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    dim = events.groupBy("event_type").agg(F.count("*").alias("type_total"))
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = salted_join(
            events, dim, on=["event_type"], salt_col="event_id", buckets=16
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "__salt" in plan  # the salt is a join key, not decoration
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
