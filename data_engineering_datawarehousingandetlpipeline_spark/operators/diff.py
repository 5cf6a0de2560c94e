"""Snapshot diff — the change-data-feed between two table versions.

What Delta's Change Data Feed / `table_changes()` serves from the
transaction log, computed relationally for plain tables: given two
snapshots of a keyed table, emit one row per changed key with
``op ∈ {insert, delete, update}`` and the old/new values. The downstream
uses are the usual CDC ones — propagate corrections to consumers, audit a
correction feed before ``merge_replace``-ing it, drive incremental view
maintenance of the non-append kind.

Plan shape: ONE co-partitioned full-outer join on the key columns — the
single shuffle a keyed diff fundamentally needs — then row-local op
classification; cost is O(|old| + |new|) at any scale, and on bucketed
tables (warehouse/bucketing.py) even the shuffle disappears. Null-safe
comparison (``<=>``) classifies NULL↔value transitions as updates rather
than losing them.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Keyed diff of two snapshots: inserts, deletes, and value updates.

    Output: the key columns, ``op``, and ``old_<c>`` / ``new_<c>`` for
    every compared column (NULL on the absent side of inserts/deletes).
    Unchanged keys are dropped. Keys must be unique per snapshot (a
    primary key) — duplicate keys would cross-join in the full-outer.
    """
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, list(keys), "full_outer")
    # seeded with False so a keys-only diff (no compared payload) still
    # classifies inserts/deletes instead of crashing the reduce
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(False),
    )
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .drop("__in_old", "__in_new")
        .select(
            *keys,
            "op",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
