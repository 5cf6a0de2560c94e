"""Bucketed warehouse tables: pre-shuffled layout for co-located joins.

The 100 TB lever this module demonstrates: a join between two large fact
tables normally shuffles BOTH sides on the join key every query. Writing
the tables bucketed on that key (``bucketBy`` — Spark's hash-bucketed
layout, recorded in the session catalog) moves that shuffle to WRITE time,
once; every subsequent join/aggregation on the bucket key reads
co-located buckets and the physical plan carries **no Exchange on either
side**. For a warehouse whose hot joins are known (events ⋈ users,
lineitem ⋈ orders), this is the difference between an O(table) shuffle
per query and none.

Spark specifics honored here:

- ``bucketBy`` requires ``saveAsTable`` (the bucket metadata lives in the
  catalog, not the files); plain ``.save(path)`` silently drops bucketing.
- Both sides of a shuffle-free join must be bucketed INTO THE SAME NUMBER
  of buckets on the join key; otherwise Spark re-shuffles the mismatched
  side (or both).
- Reading back via ``spark.table(name)``, never ``spark.read.parquet`` —
  a path read loses the bucket spec and with it the no-shuffle property.
- ``spark.sql.sources.bucketing.enabled`` is on by default; AQE respects
  bucket-derived distribution.

The reference's warehouse (one BigQuery table) delegates this decision to
BigQuery's clustering; here it is an explicit, tested layout choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally bucket-sorted) table.

    ``sort_cols`` additionally sorts within each bucket file —
    ``sortBy`` + ``bucketBy`` gives sort-merge-join both co-location AND
    pre-sorted runs, removing the per-query Sort as well as the Exchange.
    ``path`` makes it an external table (data at an explicit location);
    otherwise the managed ``spark.sql.warehouse.dir`` (a STATIC conf —
    set at session build, not per-write) hosts it.
    """
    if sort_cols:
        # One file per bucket: Spark's scan only reports the sortBy
        # ordering (letting sort-merge-join skip its per-query Sort) when
        # every bucket is a single file — with many writer tasks each
        # holding rows of every bucket, each bucket is split across many
        # sorted files whose concatenation is NOT sorted. Repartitioning on
        # the bucket column into n_buckets partitions aligns writer tasks
        # with buckets (same murmur3 % n hashing on both sides), which also
        # compacts the layout a production bucketed warehouse wants.
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(bucket_col))
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — the ONLY way the bucket spec (and the no-shuffle
    join property) survives. ``spark.read.parquet(path)`` on the same
    files would plan a full shuffle again."""
    return spark.table(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With both tables bucketed into the same bucket count on ``on``, the
    resulting physical plan contains no Exchange on either input — the
    property ``tests/test_bucketing.py`` pins.
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
