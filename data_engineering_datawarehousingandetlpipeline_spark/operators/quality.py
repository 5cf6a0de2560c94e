"""Data-quality operators: missingness, outliers, validity split, metrics.

Reference operators A1 (missingness profile), A2 (z-score outliers with
POPULATION stddev), P7 (valid/invalid quarantine split), A8 (step-level row
metrics) — re-expressed as declarative Spark plans:

- the reference's per-row ``frame.apply`` validity check becomes native
  column predicates (no UDF),
- its paired ``len()`` calls become a single ``observe()`` pass,
- ``ddof=0`` is preserved via ``stddev_pop`` semantics (Spark's default
  ``stddev`` is the sample one — a silent 1/(n−1) drift otherwise).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_datawarehousingandetlpipeline_spark.schema import (
    OBSERVATION_SCHEMA,
    REQUIRED_COLUMNS,
)

#: reference default outlier threshold (transformations.py:96).
DEFAULT_Z_THRESHOLD = 3.0
#: reference numeric columns profiled for outliers (transformations.py:99).
DEFAULT_OUTLIER_COLUMNS = ("temperature", "humidity", "wind_speed")


def missingness_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """A1: per-column NULL counts as a tidy (column_name, missing_count) table.

    One scan producing a single row of partial aggregates, then a constant
    unpivot — the distributed shape of ``detect_missing_values``
    (reference transformations.py:87-93).
    """
    columns = list(columns or df.columns)
    counts = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(c)
            for c in columns
        ]
    )
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in columns)
    return counts.selectExpr(
        f"stack({len(columns)}, {stack_expr}) AS (column_name, missing_count)"
    ).orderBy("column_name")


def zscore_outliers(
    df: DataFrame,
    columns: Sequence[str] = DEFAULT_OUTLIER_COLUMNS,
    z_threshold: float = DEFAULT_Z_THRESHOLD,
) -> DataFrame:
    """A2: rows where any column's |z| exceeds the threshold.

    z = (x − mean)/stddev_pop per column (population std, matching pandas
    ``std(ddof=0)`` in ``detect_outliers``, transformations.py:96-104). The
    global stats are a 1-row broadcast cross join — the fact table is
    scanned twice but never shuffled.
    """
    present = [c for c in columns if c in df.columns]
    stats = df.agg(
        *[F.avg(c).alias(f"__mean_{c}") for c in present],
        *[F.stddev_pop(c).alias(f"__std_{c}") for c in present],
    )
    scored = df.crossJoin(F.broadcast(stats))
    # try_divide: a constant column has stddev 0 — those columns yield NULL
    # z (never outliers), like the oracle's division by zero, instead of an
    # ANSI arithmetic failure.
    z_cols: list[Column] = [
        F.abs(F.try_divide(F.col(c) - F.col(f"__mean_{c}"), F.col(f"__std_{c}")))
        for c in present
    ]
    worst = z_cols[0] if len(z_cols) == 1 else F.greatest(*z_cols)
    return scored.filter(worst > z_threshold).drop(
        *[f"__mean_{c}" for c in present], *[f"__std_{c}" for c in present]
    )


def _field_is_valid(field: T.StructField) -> Column:
    """Validity predicate for one field: NULL is fine unless required."""
    col = F.col(field.name)
    if isinstance(field.dataType, T.TimestampType):
        ok = col.try_cast("timestamp").isNotNull()
    elif isinstance(field.dataType, (T.DoubleType, T.FloatType)):
        ok = col.try_cast("double").isNotNull()
    elif isinstance(field.dataType, T.StringType):
        ok = col.try_cast("string").isNotNull()
    else:
        ok = col.try_cast(field.dataType).isNotNull()
    if field.name in REQUIRED_COLUMNS:
        return ok
    return col.isNull() | ok


def validate_split(
    df: DataFrame, schema: T.StructType = OBSERVATION_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """P7: (valid, invalid) split with one cached parent.

    The reference computes this with a per-row Python closure
    (``frame.apply(_row_is_valid, axis=1)``, transformations.py:161-175);
    here validity is a single boolean column of native predicates, and the
    parent is cached so the two complementary filters don't recompute the
    upstream plan.
    """
    predicates = [_field_is_valid(f) for f in schema.fields if f.name in df.columns]
    for required in REQUIRED_COLUMNS:
        if required in df.columns:
            predicates.append(F.col(required).isNotNull())
    is_valid = predicates[0]
    for p in predicates[1:]:
        is_valid = is_valid & p
    tagged = df.withColumn("__valid", is_valid).cache()
    valid = tagged.filter(F.col("__valid")).drop("__valid")
    invalid = tagged.filter(~F.col("__valid")).drop("__valid")
    return valid, invalid


def with_row_metrics(df: DataFrame, name: str) -> DataFrame:
    """A8: attach an ``observe`` metric (row count) without an extra action.

    Replaces the reference's paired ``len(frame)`` calls around every
    cleaning step — metrics ride along with whatever action runs next.
    """
    return df.observe(name, F.count(F.lit(1)).alias("n_rows"))


def membership_filter(df: DataFrame, column: str, allowed: Sequence[str]) -> DataFrame:
    """P4: whitelist filter (``build_long_term_tables``'s station subset,
    transformations.py:112). At scale this is a pushed-down IN predicate."""
    return df.filter(F.col(column).isin(list(allowed)))


def long_term_tables(
    df: DataFrame,
    ids: Sequence[str],
    key: str = "station_id",
    ts_col: str = "timestamp",
) -> DataFrame:
    """A3: whitelist + per-key time ordering, as ONE DataFrame.

    The reference returns ``dict[station_id → sorted pandas frame]``
    (transformations.py:107-115) — a pandas-ism. The distributed shape is
    a single frame repartitioned by key and sorted within partitions;
    downstream per-station consumers read their partition in time order.
    """
    return (
        membership_filter(df, key, ids)
        .repartition(key)
        .sortWithinPartitions(key, ts_col)
    )
