"""Time-series joins Spark lacks as built-ins: as-of and banded range joins.

Both are implemented in their shuffle-minimal forms rather than as naive
inequality joins (which Catalyst can only execute as a broadcast
nested-loop — quadratic and undistributable at warehouse scale):

- **as-of join** (:func:`as_of_join`): "for each left row, the latest
  right row at-or-before it, per key". Implemented as union → one window
  pass: tag sides, sort within key by (ts, side), carry the right side's
  values forward with ``last(..., ignorenulls=True)``, keep left rows.
  ONE shuffle on the key, state O(1) per row — the same merge-scan shape
  kdb/QuestDB use natively.
- **banded range join** (:func:`band_join`): "pairs within ±band on the
  time axis, per key". Implemented by quantizing time to band-width
  buckets and replicating ONE side to its three adjacent buckets: every
  qualifying pair lands in exactly one (key, bucket) join cell, so the
  equi-join + exact band filter finds all pairs with ≤3× replication
  instead of a cross join. Equivalent oracle: an inequality join.

Neither depends on the distribution of keys beyond ordinary equi-join
skew, which AQE's skew-join splitting already handles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: dict[str, str],
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts`` per key.

    ``right_value_cols`` maps right-side column → output alias (the right
    timestamp can be carried by aliasing ``ts_col``). Left rows with no
    prior right row keep NULLs (left-outer as-of semantics, matching
    DuckDB's ``ASOF LEFT JOIN``). Ties (equal timestamps) match — the
    right side sorts before the left at the same instant.

    ``tiebreak_cols`` (right-side source column names, highest priority
    first) decides which right row wins when SEVERAL share one timestamp:
    the largest tiebreak tuple. When omitted, the largest value struct
    wins — deterministic, but field-order-dependent (e.g. a (state,
    version) struct resolves by state string before version). SCD2
    callers should pass ``("version",)`` so a same-instant version tie
    resolves to the latest version, matching the intent of "current as of
    ts" even when two dimension versions share a valid_from.
    """
    out_cols = list(right_value_cols.values())
    # ONE struct carries the whole matched right row: last(struct, ignorenulls)
    # takes it atomically, so a NULL in one value column can never resurrect
    # that field from an older right row (struct-level null-ness is what
    # ignorenulls tests — field NULLs ride along, matching ASOF LEFT JOIN).
    tiebreak = F.struct(
        *[F.col(c) for c in (tiebreak_cols or ())],
        F.struct(
            *[F.col(src).alias(dst) for src, dst in right_value_cols.items()]
        ),
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in right_value_cols.items()]
        ).alias("__rv"),
        tiebreak.alias("__tb"),
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # the tiebreak struct as final orderer: among right rows at the same
    # instant the largest tiebreak tuple wins deterministically (left rows
    # carry a NULL struct there, which sorts first and never reorders).
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("__side").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*", F.last("__rv", ignorenulls=True).over(w).alias("__c")
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            "*", *[F.col(f"__c.{c}").alias(c) for c in out_cols]
        )
        .drop("__side", "__rv", "__tb", "__c")
    )


def band_join(
    points: DataFrame,
    others: DataFrame,
    on: str,
    ts_col: str,
    band_seconds: int,
    other_cols: dict[str, str],
) -> DataFrame:
    """Left band join: pair each point with others within ±band, per key.

    The ``others`` side replicates to its bucket and both neighbors
    (bucket width = band width), so any pair within the band shares
    exactly one (key, bucket) cell; the exact |Δt| ≤ band filter then
    applies as a join condition (inclusive both ends, like ``BETWEEN``).
    Unmatched points survive with NULLs.
    """
    band_us = int(band_seconds) * 1_000_000
    p = points.withColumn("__bucket", F.floor(F.unix_micros(F.col(ts_col)) / band_us))
    o = others.select(
        F.col(on).alias("__o_key"),
        F.unix_micros(F.col(ts_col)).alias("__o_us"),
        *[F.col(src).alias(dst) for src, dst in other_cols.items()],
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col("__o_us") / band_us) - 1,
                F.floor(F.col("__o_us") / band_us),
                F.floor(F.col("__o_us") / band_us) + 1,
            )
        ),
    )
    cond = (
        (p[on] == o["__o_key"])
        & (p["__bucket"] == o["__bucket"])
        & (
            F.abs(F.unix_micros(p[ts_col]) - o["__o_us"]) <= F.lit(band_us)
        )
    )
    return p.join(o, cond, "left").drop("__bucket", "__o_key", "__o_us")
