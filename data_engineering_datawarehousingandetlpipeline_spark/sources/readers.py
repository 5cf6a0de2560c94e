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
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


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
