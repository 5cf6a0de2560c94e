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
