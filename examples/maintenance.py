#!/usr/bin/env python
"""Day-2 operations demo: the warehouse maintenance loop in one run.

What an operator of this engine runs after the pipeline is live:

    micro-batch ingestion (many small files) → post-write verification
    → partition-granular compaction (bin-pack the cold days, skip the
    hot one) → retention (drop partitions past the window, replayable
    anchor) → correction feed via MERGE update-on-match → heartbeat
    monitor flags a producer that went silent (event-time timeout, so a
    replay of the same shards raises the same alarm).

Run: ``python examples/maintenance.py`` (temp workdir, seconds).
"""

from __future__ import annotations

import datetime
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
    clean_batch,
)
from data_engineering_datawarehousingandetlpipeline_spark.streaming.stateful import (
    stateful_heartbeat,
)
from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
    WarehouseTable,
)


def main() -> None:
    spark = get_spark("maintenance-demo")
    work = Path(tempfile.mkdtemp(prefix="maintenance_demo_"))
    wh = WarehouseTable(spark, str(work / "warehouse"))

    # --- 1. micro-batch ingestion: one file per (station, reading) ------
    readings = [
        ("s1", "2024-03-01T00:10:00Z", "1.0"),
        ("s2", "2024-03-01T05:20:00Z", "2.0"),
        ("s3", "2024-03-01T09:30:00Z", "3.0"),
        ("s1", "2024-03-02T00:40:00Z", "4.0"),
        ("s2", "2024-03-02T05:50:00Z", "5.0"),
        ("s1", "2024-03-03T07:00:00Z", "6.0"),
    ]
    for row in readings:
        wh.merge_upsert(
            clean_batch(
                spark.createDataFrame(
                    [row],
                    schema="station_id string, timestamp string, temperature string",
                )
            )
        )
    print(f"ingested rows={wh.count()} files={wh.data_file_count()}")

    # --- 2. compaction: bin-pack days older than the hot partition ------
    rewritten = wh.compact_partitions(
        target_file_rows=100, before=datetime.date(2024, 3, 3)
    )
    print(f"compacted partitions={rewritten} files={wh.data_file_count()}")
    # the audit surface: what did maintenance do (Delta history, emulated)
    for row in wh.maintenance_log().orderBy("run_id", "partition").collect():
        print(
            f"  log run={row.run_id} op={row.op} partition={row.partition}"
            f" files {row.files_before}->{row.files_after}"
            f" rows={row.n_rows} anchor={row.anchor}"
        )

    # --- 3. retention: drop days beyond the window (explicit anchor) ----
    dropped = wh.expire_partitions(keep_days=1, anchor=datetime.date(2024, 3, 3))
    print(f"expired partitions={dropped} rows={wh.count()}")

    # --- 4. correction feed: MERGE update-on-match ----------------------
    correction = clean_batch(
        spark.createDataFrame(
            [("s1", "2024-03-02T00:40:00Z", "4.5")],  # revised reading
            schema="station_id string, timestamp string, temperature string",
        )
    )
    wh.merge_replace(correction)
    revised = (
        wh.read().filter(F.col("station_id") == "s1")
        .orderBy("timestamp").select("temperature").collect()
    )
    print("post-correction s1 temperatures:", [r.temperature for r in revised])

    # --- 5. heartbeat: the silent producer raises an alarm --------------
    indir = work / "hb"
    indir.mkdir()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )

    def drain() -> None:
        q = (
            stateful_heartbeat(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .json(str(indir)),
                silence_seconds=3600,
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(work / "alarms"))
            .option("checkpointLocation", str(work / "hb_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def land(rows: list[dict], name: str) -> None:
        with open(indir / name, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")

    land([{"user_id": 1, "ts": "2024-03-01T10:00:00.000Z"},
          {"user_id": 2, "ts": "2024-03-01T10:05:00.000Z"}], "shard1.json")
    drain()
    land([{"user_id": 2, "ts": "2024-03-01T14:00:00.000Z"}], "shard2.json")
    drain()
    land([{"user_id": 2, "ts": "2024-03-01T14:30:00.000Z"}], "shard3.json")
    drain()
    alarms = spark.read.parquet(str(work / "alarms")).collect()
    for a in alarms:
        print(
            f"ALARM user={a.user_id} last_seen={a.last_seen} "
            f"silent_at={a.silent_at} events={a.n_events}"
        )
    assert [a.user_id for a in alarms] == [1]  # producer 2 kept sending

    spark.stop()
    print("maintenance loop complete")


if __name__ == "__main__":
    main()
