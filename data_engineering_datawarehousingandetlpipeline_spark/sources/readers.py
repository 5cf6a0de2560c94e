"""Batch sources (reference S1/S8 + the driver's parquet corpus).

The reference's batch source is a bundled JSON fixture
(``src/data_processing/fmi_client.py:139-142``); its warehouse scans are SQL
pushed to BigQuery. Here both become declarative Spark reads so Catalyst
gets predicate pushdown + column pruning for free (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from data_engineering_datawarehousingandetlpipeline_spark.schema import (
    OBSERVATION_SCHEMA,
    apply_schema,
)

#: Driver-generated corpus (TESTDATA.md) — one parquet file per table.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Plain parquet scan → pushdown/pruning apply.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which the Spark
    reader rejects; it is read as raw nanos (``nanosAsLong``) and truncated
    to a microsecond timestamp — exactly how DuckDB reads TIMESTAMP_NS, so
    oracle comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str, ts_range=None) -> DataFrame:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") != "bigint":  # pragma: no cover - non-nanos data
        return df
    if ts_range is not None:
        start, end = ts_range
        # Transpose the µs-timestamp bounds into raw-nanos space and filter
        # BEFORE the conversion: a predicate on the stored bigint column
        # pushes down to the parquet scan (row-group min/max skipping),
        # which a predicate on the derived timestamp cannot.
        # µs = ns div 1000, so µs ∈ [S, E] ⟺ ns ∈ [S·1000, E·1000 + 999].
        start_ns = _to_epoch_us(start) * 1000
        end_ns = _to_epoch_us(end) * 1000 + 999
        df = df.filter((F.col("ts") >= start_ns) & (F.col("ts") <= end_ns))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _to_epoch_us(value) -> int:
    import datetime as dt

    if isinstance(value, str):
        value = dt.datetime.fromisoformat(value)
    if value.tzinfo is None:
        value = value.replace(tzinfo=dt.timezone.utc)
    # exact integer µs (float .timestamp() loses precision at µs scale)
    return (value - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)) // dt.timedelta(
        microseconds=1
    )


def load_events_range(
    spark: SparkSession, sf_dir: str, start_ts, end_ts
) -> DataFrame:
    """Events scan with a pushdown-friendly timestamp range (see _load_events)."""
    return _load_events(
        spark, os.path.join(sf_dir, "events.parquet"), ts_range=(start_ts, end_ts)
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All corpus tables as a dict (lazy scans — nothing is read yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_observations_json(spark: SparkSession, path: str) -> DataFrame:
    """Reference S1: load a JSON array file of raw observations.

    ``multiLine`` because the fixture is a single JSON array, not NDJSON
    (reference ``data/sample_observations.json``). The raw read keeps every
    field as string and :func:`apply_schema` performs the lenient projection
    + coercion, mirroring ``observations_as_dataframe`` →
    ``apply_bigquery_schema`` (fmi_client.py:158-171, transformations.py:118-141).
    """
    raw = spark.read.option("multiLine", "true").json(path)
    return apply_schema(raw, OBSERVATION_SCHEMA)
