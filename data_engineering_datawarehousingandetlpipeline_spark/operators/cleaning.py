"""Cleaning core: required-field filter, dedup families, hour floor.

Reference operators P3 (drop missing required), D1 (dedup keep-first),
D2 (dedup keep-LAST per key — the reference's signature semantics), and
F7 (hour floor — documented + tested in the reference but missing from its
code, SURVEY.md §2.10.1; implemented here as the *intended* spec).

Scale notes (100 TB): every dedup here is one hash shuffle on the key
columns; keep-first/keep-last use a window ``row_number`` which sorts only
*within* each key group (no global sort). For heavily skewed keys AQE
skew-join/partition-splitting applies; for repeated dedups over the same
keys, pre-bucketing the warehouse table by key avoids the shuffle entirely
(plan-gated: tests/test_bucketing.py::test_bucketed_dedup_has_no_exchange
pins that keep-last over a key-bucketed table carries no Exchange).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.schema import (
    KEY_COLUMNS,
    REQUIRED_COLUMNS,
)


def drop_missing_required(
    df: DataFrame, required: Sequence[str] = REQUIRED_COLUMNS
) -> DataFrame:
    """P3: drop rows with NULL in any required column.

    Reference: ``transformations.py:189-198`` (``dropna(subset=...)``).
    """
    return df.na.drop(subset=list(required))


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order_by: str | None = None,
) -> DataFrame:
    """D1: one row per key; first occurrence wins.

    Reference ``drop_duplicates(subset=keys)`` (``transformations.py:76-84``)
    is input-order dependent. Distributed Spark has no implicit input order,
    so the caller supplies an explicit arrival ordinal ``order_by`` (source
    offset / ingest ts). Without one this degrades to ``dropDuplicates`` —
    an arbitrary-but-single winner, matching the reference whenever duplicate
    payloads are equal (the common Kafka-redelivery case).
    """
    if order_by is None:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(F.col(order_by).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_last(
    df: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order_by: Sequence[str] = ("timestamp",),
) -> DataFrame:
    """D2: one row per key; the LATEST by ``order_by`` wins.

    Reference ``drop_duplicates(..., keep="last")`` in
    ``prepare_hourly_for_bigquery`` (``transformations.py:233-237``) — "latest
    record per (station, hour) wins" (reference README.md:75). pandas encodes
    "latest" as input position; Spark needs the ordering to be explicit, so
    ``order_by`` is the arrival/source ordering (descending applied here).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def floor_hour(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """F7: truncate ``ts_col`` to the hour (the documented-but-missing step)."""
    return df.withColumn(ts_col, F.date_trunc("hour", F.col(ts_col)))


def prepare_hourly(
    df: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    ts_col: str = "timestamp",
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """The reference's hourly cleaning pipeline with the floor fixed.

    ``prepare_hourly_for_bigquery`` (``transformations.py:217-245``):
    drop missing required → floor to hour → keep-last within (key, hour).
    ``order_by`` defaults to the *original* timestamp so "latest within the
    hour wins" is well-defined after flooring collapses the key.
    """
    ordered = list(order_by) if order_by else [f"__orig_{ts_col}"]
    out = drop_missing_required(df, required=keys)
    if not order_by:
        out = out.withColumn(f"__orig_{ts_col}", F.col(ts_col))
    out = floor_hour(out, ts_col)
    out = dedup_keep_last(out, keys=keys, order_by=ordered)
    if not order_by:
        out = out.drop(f"__orig_{ts_col}")
    return out
