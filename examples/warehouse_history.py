#!/usr/bin/env python
"""Warehouse-maintenance demo: versioned dimensions + incremental reports.

The round-6 warehouse family in one runnable pipeline over the event
stream:

    events → streaming SCD Type-2 build (closed versions land
    incrementally; open versions ride the state store) → batch history
    parity check → point-in-time snapshot census → incremental rollup
    (merged day states == full recompute) → incremental distinct
    (merged HLL sketch states == single-pass sketch).

Run: ``python examples/warehouse_history.py`` (uses the sf0.001 testdata
and a temp workdir).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.plans.analytics import (
    q_incremental_distinct,
    q_incremental_rollup,
    q_scd2_snapshots,
    q_scd2_user_state,
    q_streaming_scd2,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def run_checks(spark, sf_dir: str = SF_DIR) -> dict[str, int]:
    """The demo body, self-asserting; returns the headline counts (also
    driven by tests/test_warehouse_streaming.py against the shared
    session)."""
    # 1. The Type-2 dimension, built incrementally as the stream drains
    streamed = q_streaming_scd2(spark, sf_dir)
    n_closed = streamed.count()

    # 2. ...equals the closed versions of the batch build
    batch = q_scd2_user_state(spark, sf_dir)
    batch_closed = batch.filter(~F.col("is_current")).filter(
        F.col("user_id") < 5
    )
    assert n_closed == batch_closed.count(), "stream/batch history drift"
    print(f"closed versions (stream == batch): {n_closed}")

    # 3. Point-in-time census: what the dimension looked like AS OF
    #    each midnight
    snaps = q_scd2_snapshots(spark, sf_dir)
    n_cells = snaps.count()
    first, last = snaps.first(), snaps.orderBy(
        F.col("snapshot_ts").desc(), F.col("state").desc()
    ).first()
    print(
        f"snapshot census: {n_cells} (midnight, state) cells, "
        f"{first.snapshot_ts:%Y-%m-%d} → {last.snapshot_ts:%Y-%m-%d}"
    )

    # 4. Incremental reports: merged partial states == full recompute
    rollup = q_incremental_rollup(spark, sf_dir).collect()
    assert all(r.merge_consistent for r in rollup)
    print(f"incremental rollup merge-consistent for {len(rollup)} event types")
    distinct = q_incremental_distinct(spark, sf_dir).collect()
    assert all(
        r.merged_within_tolerance and r.direct_within_tolerance
        for r in distinct
    )
    print(
        "incremental distinct: merged HLL union and single-pass sketch "
        f"both within tolerance of exact for {len(distinct)} event types"
    )
    return {
        "closed_versions": n_closed,
        "snapshot_cells": n_cells,
        "event_types": len(rollup),
    }


def main() -> None:
    spark = get_spark(app_name="warehouse-history-demo", master="local[4]")
    run_checks(spark)
    spark.stop()


if __name__ == "__main__":
    main()
