"""Z-order (Morton) clustering — multi-column data skipping for parquet.

Sorting a rewrite by ONE column gives perfect row-group min/max pruning on
that column and none on any other; interleaving the bits of several
columns' bucket ranks (the Morton curve) gives every listed column
LOCALITY in every file, so per-file min/max footers prune scans filtered
on ANY of them. This is what Delta's ``OPTIMIZE ... ZORDER BY`` and
Iceberg's sort-order rewrite do; here it is a plain column expression a
rewrite can range-partition and sort by.

Bucketing uses broadcast min/max linear scaling — one 1-row aggregate,
map-side everywhere else. On heavily skewed columns swap the scaling for
approx_percentile cut points (equi-depth buckets) the same way
``doc_quality_deciles`` documents; the interleave is unchanged. The
skipping benefit is MEASURED, not assumed, in
tests/test_r8_queries.py::test_zorder_files_are_local_in_both_columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "__z",
) -> DataFrame:
    """Append the Morton key interleaving ``bits`` bucket bits per column.

    Numeric columns only; NULLs bucket to 0 (they cluster together at
    the curve's origin, which is also where a NULL-filter scan prunes
    best). All input columns pass through.
    """
    levels = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    scaled = df.crossJoin(F.broadcast(bounds))
    bucket_cols = {}
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = (F.col(c).cast("double") - mn) / (mx - mn)
        bucket_cols[c] = (
            F.when(F.col(c).isNull() | (mx <= mn), F.lit(0))
            .otherwise(
                F.least(F.lit(levels), F.floor(span * levels).cast("long"))
            )
            .alias(f"__b_{c}")
        )
    scaled = scaled.select("*", *bucket_cols.values())
    z: Column = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__b_{c}"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return scaled.select(
        *df.columns, z.alias(out_col)
    )


def zorder_interleave(buckets: Sequence[int], bits: int = 8) -> int:
    """Pure-Python reference of the interleave (for tests/verification)."""
    z = 0
    for b in range(bits):
        for i, v in enumerate(buckets):
            z |= ((v >> b) & 1) << (b * len(buckets) + i)
    return z
