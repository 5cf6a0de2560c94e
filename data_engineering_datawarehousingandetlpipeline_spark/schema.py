"""Typed schemas + lenient schema application (reference P1/P2, §1.2).

The reference declares one fixed warehouse schema (``BIGQUERY_HOURLY_SCHEMA``,
reference ``src/data_processing/transformations.py:17-74``) and applies it to
dynamically shaped inputs with pandas semantics: project + reorder to exactly
the declared columns (extras like ``elevation`` dropped), lenient coercion
(``pd.to_numeric(errors="coerce")`` → unparseable becomes NULL), ISO-8601
timestamps normalized to UTC, and absent optional columns materialized as
NULL (``transformations.py:118-141``).

Spark 4 runs ANSI mode by default, so plain ``cast`` throws on bad input —
every coercion here is ``try_cast`` / ``try_to_timestamp``, which reproduces
the pandas "coerce to NULL" contract exactly while keeping ANSI on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Warehouse schema — 8 columns, declared order is the projection order
#: (reference transformations.py:17-74; README.md:35-44).
OBSERVATION_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.StringType(), True),
        T.StructField("station_name", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("humidity", T.DoubleType(), True),
        T.StructField("wind_speed", T.DoubleType(), True),
    ]
)

#: Columns that must be non-NULL in the warehouse (REQUIRED mode in the
#: reference schema; enforced procedurally at transformations.py:189-191).
REQUIRED_COLUMNS = ("station_id", "timestamp")

#: Row identity for dedup / merge (reference README.md:45).
KEY_COLUMNS = ("station_id", "timestamp")


def _coerce(source: Column, dtype: T.DataType) -> Column:
    """Lenient cast matching pandas ``errors="coerce"`` semantics."""
    if isinstance(dtype, T.TimestampType):
        # Accepts ISO-8601 with 'Z'/offset/naive; naive is read in the session
        # timezone, which the engine pins to UTC (reference kafka_stream.py:260-267).
        return F.coalesce(
            source.try_cast("timestamp"),
            F.try_to_timestamp(source.try_cast("string")),
        )
    return source.try_cast(dtype)


def apply_schema(df: DataFrame, schema: T.StructType = OBSERVATION_SCHEMA) -> DataFrame:
    """Project + reorder to ``schema``'s columns with lenient coercion (P1+P2).

    - columns not in ``schema`` are dropped (e.g. ``elevation``),
    - absent columns are materialized as typed NULLs,
    - present columns are ``try_cast`` to the declared type.
    """
    existing = set(df.columns)
    projected = [
        (
            _coerce(F.col(field.name), field.dataType)
            if field.name in existing
            else F.lit(None).cast(field.dataType)
        ).alias(field.name)
        for field in schema.fields
    ]
    return df.select(*projected)
