#!/usr/bin/env python
"""Time-travel ops demo: corrections, erasure, audit, and history hygiene.

The lifecycle a regulated deployment actually runs, end to end on the
version-tracked warehouse:

    nightly appends (v1..v3) → upstream correction feed via MERGE
    update-on-match (v4) → CHANGE-FEED AUDIT of exactly what the
    correction did (changes_between, before propagating downstream) →
    GDPR erasure of one user (v5) → regulator question "what did the
    table say before the correction?" answered by read_as_of THROUGH the
    rewrites → compaction rewrites files, history still readable →
    vacuum frees old versions and time travel to them fails loudly.

The correction batch is built with the EXTERNAL producer's schema (plain
rows, no derived ``dt`` column) — the realistic-feed discipline that
exposed the original ``merge_replace`` bug.

Run: ``python examples/time_travel.py`` (temp workdir, seconds).
"""

from __future__ import annotations

import datetime
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
    WarehouseTable,
)

DDL = "event_id long, user_id long, ts string, value double"


def main() -> None:
    spark = get_spark("time-travel-demo")
    work = Path(tempfile.mkdtemp(prefix="time_travel_demo_"))
    wh = WarehouseTable(
        spark, str(work / "events"), keys=["event_id"], ts_col="ts",
        track_versions=True,
    )

    def batch(rows):
        return spark.createDataFrame(rows, DDL).withColumn(
            "ts", F.to_timestamp("ts")
        )

    # --- 1. three nightly appends → v1..v3 ------------------------------
    nights = [
        [(1, 10, "2024-03-01T08:00:00", 5.0),
         (2, 20, "2024-03-01T09:00:00", 7.0)],
        [(3, 10, "2024-03-02T08:00:00", 6.0),
         (4, 30, "2024-03-02T10:00:00", 2.0)],
        [(5, 20, "2024-03-03T08:00:00", 9.0)],
    ]
    for rows in nights:
        wh.append(batch(rows), verify=True)
    assert [r.op for r in wh.versions().collect()] == ["append"] * 3
    print(f"v1..v3 committed, table rows = {wh.count()}")

    # --- 2. upstream correction feed (external schema, no dt) → v4 ------
    corrections = batch([(2, 20, "2024-03-01T09:00:00", 7.5)])
    wh.merge_replace(corrections)

    # --- 3. audit the correction BEFORE propagating it ------------------
    feed = wh.changes_between(3, 4, compare_cols=["value"]).collect()
    assert len(feed) == 1 and feed[0].op == "update"
    assert (feed[0].old_value, feed[0].new_value) == (7.0, 7.5)
    print("change-feed audit: correction did exactly one update, 7.0 → 7.5")

    # --- 4. GDPR erasure of user 10 → v5 ---------------------------------
    erased = wh.delete_where(F.col("user_id") == 10)
    assert erased == 2
    assert wh.read().filter("user_id = 10").count() == 0
    deletes = wh.changes_between(4, 5, compare_cols=["value"]).collect()
    assert sorted(r.event_id for r in deletes) == [1, 3]
    assert {r.op for r in deletes} == {"delete"}
    print("erasure: 2 rows gone, change feed classifies both as deletes")

    # --- 5. the regulator question: table as of before the correction ---
    v3 = {r.event_id: r.value for r in wh.read_as_of(3).collect()}
    assert v3[2] == 7.0 and 1 in v3  # pre-correction, pre-erasure
    print("read_as_of(3) reconstructs the pre-correction table exactly")

    # --- 6. compaction rewrites files; history still readable -----------
    wh.compact_partitions(
        target_file_rows=1000, before=datetime.date(2024, 3, 10)
    )
    assert {r.event_id: r.value for r in wh.read_as_of(3).collect()} == v3
    print("compaction rewrote partitions; v3 still readable via the mirror")

    # --- 7. rollback: RESTORE to the pre-erasure state, then forward ----
    pre_erasure = 4
    wh.restore(pre_erasure)                       # zero-copy, new version
    assert wh.read().filter("user_id = 10").count() == 2  # rows are back
    latest = max(r.version for r in wh.versions().collect())
    wh.restore(latest - 1)  # re-apply the erasure by restoring forward
    assert wh.read().filter("user_id = 10").count() == 0
    print("restore: rolled back to v4 and forward again — history intact")

    # --- 8. hygiene: vacuum old versions, time travel fails loudly ------
    latest = max(r.version for r in wh.versions().collect())
    freed = wh.vacuum_versions(keep_last=1)
    print(f"vacuum kept v{latest}, freed {freed} retained files")
    try:
        wh.read_as_of(3)
    except ValueError as exc:
        print(f"read_as_of(3) after vacuum raises as it must: {exc}")
    else:
        raise AssertionError("vacuumed version must not be readable")
    assert wh.read_as_of(latest).count() == wh.read().count()

    log_ops = [r.op for r in wh.maintenance_log().orderBy("run_id").collect()]
    print(f"maintenance audit trail: {log_ops}")
    print("time-travel demo OK")
    spark.stop()


if __name__ == "__main__":
    main()
