"""Distributed global order statistics: exact NTILE without a global sort.

``NTILE(n) OVER (ORDER BY ...)`` with no PARTITION BY is the classic
single-machine trap: Spark executes it as ONE window task holding the whole
input — fine on a laptop, a straggler-then-OOM at warehouse scale. But a
tile assignment only needs each row's GLOBAL RANK, and global rank
distributes exactly with the textbook two-phase scheme every external
sorter uses:

1. ``repartitionByRange`` on the ordering key — one range shuffle; rows
   land so that every row in partition *i* sorts before every row in
   partition *i+1* (the ordering key includes a unique tiebreaker, so
   partitions are balanced even under value skew).
2. per-partition ``row_number`` — a window PARTITIONED BY the range
   bucket, so no task ever sees more than one bucket.
3. per-partition counts → exclusive prefix sums. This tiny table is one
   row per SHUFFLE PARTITION (a cluster-config constant, independent of
   data volume), so its prefix-sum window and its broadcast back are
   O(#partitions), never O(rows).
4. ``global_rank = bucket_offset + local_row_number``; the tile is then
   pure per-row arithmetic against the total count — map-side, no further
   shuffle.

The result is bit-identical to ``NTILE`` (ties split by the caller's
tiebreaker exactly as a monolithic sort would) at the cost of one range
exchange — the same price as ``ORDER BY`` — instead of a single-task
window. DuckDB's exact ``NTILE`` therefore remains a valid oracle twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    rank_col: str = "rank",
    size_col: str = "n",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (PARTITION BY *group_cols ORDER BY
    *order_cols)`` plus the group size — without one-task-per-group.

    A plain grouped window puts EVERY row of a group in one task: fine
    for thousands of small groups, the same single-machine trap as a
    global sort when a handful of huge groups hold the corpus (event
    types, languages, sources). Same scheme as :func:`distributed_ntile`,
    range-bucketing on ``(*group_cols, *order_cols)`` so each group
    spans many buckets in order; the per-(bucket, group) counts table —
    O(#partitions × #groups present per bucket boundary), a config-sized
    constant times the group count — yields per-group exclusive prefix
    offsets and total sizes, broadcast back. ``order_cols`` must make
    each group a total order (unique tiebreaker). All input columns pass
    through; ``rank_col`` (1-based within group) and ``size_col`` (group
    row count) are appended. For very high-cardinality group keys swap
    the broadcast for a plain shuffle join (AQE picks the strategy when
    the hint is dropped) — at that cardinality groups are small and the
    ordinary keyed window is the right plan anyway.
    """
    full_order = [F.col(c).asc() for c in [*group_cols, *order_cols]]
    if num_partitions is None:
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except ValueError:
            num_partitions = 32
    parts = (
        df.repartitionByRange(num_partitions, *full_order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    gp_counts = parts.groupBy("__pid", *group_cols).agg(
        F.count("*").alias("__pc")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = gp_counts.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__pc").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__pc").over(Window.partitionBy(*group_cols)).alias(size_col),
    )
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        parts.withColumn("__lr", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: Sequence[str],
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n_tiles) OVER (ORDER BY *order_cols)`` — distributed.

    ``order_cols`` (ascending) MUST be a total order (include a unique
    tiebreaker column) — that is what makes the tile assignment
    deterministic on any engine. All input columns pass through;
    ``out_col`` (int, 1-based) is appended. ``num_partitions`` defaults
    to the session's shuffle partitions.
    """
    sort_cols = [F.col(c).asc() for c in order_cols]
    if num_partitions is None:
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except ValueError:  # "auto" under some AQE configs
            num_partitions = 32
    # Range-bucket rows; pin the bucketed set — it feeds BOTH the count
    # pass and the ranked pass (shared-subtree rule: unpinned, the source
    # would be scanned twice).
    parts = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pid_counts = parts.groupBy("__pid").agg(F.count("*").alias("__pc"))
    # Exclusive prefix sum + grand total over one-row-per-partition data:
    # these windows ARE single-partition, but over at most
    # `num_partitions` rows — a config constant, not a data size. The
    # broadcast back is equally tiny, and carrying the total as a second
    # window over the same counts avoids a separate aggregate + cross
    # join (one RDD pass fewer).
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = pid_counts.select(
        "__pid",
        F.coalesce(F.sum("__pc").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__pc").over(w_all).alias("__n"),
    )
    # Per-bucket local rank: partitioned window — every task sees exactly
    # one range bucket, never the whole input.
    w_local = Window.partitionBy("__pid").orderBy(*sort_cols)
    ranked = (
        parts.withColumn("__lr", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn("__rank", F.col("__off") + F.col("__lr"))
    )
    # NTILE semantics: with n rows, the first (n % t) tiles hold
    # ceil(n/t) rows, the rest floor(n/t). greatest(base, 1) guards the
    # n < t case, where every row lands in the `big` branch anyway.
    base = F.floor(F.col("__n") / n_tiles)
    rem = F.col("__n") % n_tiles
    big_rows = (base + F.lit(1)) * rem
    tile = F.when(
        F.col("__rank") <= big_rows,
        F.ceil(F.col("__rank") / (base + F.lit(1))),
    ).otherwise(
        rem + F.ceil((F.col("__rank") - big_rows) / F.greatest(base, F.lit(1)))
    )
    return (
        ranked.withColumn(out_col, tile.cast("int"))
        .drop("__pid", "__lr", "__off", "__n", "__rank")
    )
