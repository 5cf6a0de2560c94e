#!/usr/bin/env python
"""Data-contract lifecycle demo: expectations, quarantine, evolution.

The loop a feed owner runs when an upstream producer misbehaves and then
upgrades:

    batch contract check (one scan) → quarantine the violators, load the
    clean rows → the producer starts streaming: per-micro-batch contract
    reports + quarantine partitions → the producer adds a column: strict
    append refuses, ``evolve_schema=True`` widens the table (NULL
    backfill both directions) → a stale producer replays an old-schema
    batch: still idempotent, still fits the widened table → the contract
    gains a check for the new column and the audit trail shows the whole
    story.

Run: ``python examples/data_contracts.py`` (temp workdir, seconds).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    expectations as X,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
    start_contract_monitor,
)
from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
    WarehouseTable,
)

def contract():
    # built lazily: Column construction needs an active SparkContext
    return [
        X.not_null("temp"),
        X.accepted_range("temp", -60.0, 60.0),
        X.accepted_values("station", ["s1", "s2", "s3"]),
    ]


def ts_rows(spark, rows, ddl):
    df = spark.createDataFrame(rows, ddl.replace("ts timestamp", "ts string"))
    return df.withColumn("ts", F.to_timestamp("ts"))


def run_checks(spark) -> dict:
    work = Path(tempfile.mkdtemp(prefix="contracts_demo_"))
    wh = WarehouseTable(
        spark, str(work / "warehouse"), keys=["station", "ts"], ts_col="ts"
    )

    # --- 1. batch contract: check, quarantine, load the clean slice ----
    batch = ts_rows(
        spark,
        [
            ("s1", "2024-03-01T00:00:00", 12.0),
            ("s2", "2024-03-01T00:10:00", None),     # not_null violation
            ("s3", "2024-03-01T00:20:00", 981.0),    # sensor glitch
            ("sX", "2024-03-01T00:30:00", 10.0),     # unknown station
            ("s1", "2024-03-01T01:00:00", 13.5),
        ],
        "station string, ts timestamp, temp double",
    )
    report = X.check_contract(batch, contract(), unique_key=["station", "ts"])
    print("== batch contract report")
    report.show(truncate=False)

    violated = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in contract()])
    )
    flagged = batch.withColumn("violated", violated)
    bad = flagged.filter(F.size("violated") > 0)
    clean = flagged.filter(F.size("violated") == 0).drop("violated")
    bad.write.mode("overwrite").parquet(str(work / "quarantine"))
    n = wh.merge_upsert(clean)
    print(f"loaded {n} clean rows; quarantined {bad.count()}")

    # --- 2. the producer goes streaming: per-micro-batch reports -------
    indir = work / "incoming"
    indir.mkdir()
    shards = [
        [{"station": "s1", "ts": "2024-03-01T02:00:00", "temp": 14.0},
         {"station": "s2", "ts": "2024-03-01T02:00:00", "temp": -80.0}],
        [{"station": "s3", "ts": "2024-03-01T03:00:00", "temp": 15.0},
         {"station": "s3", "ts": "2024-03-01T03:00:00", "temp": 15.2}],
    ]
    for i, rows in enumerate(shards):
        path = indir / f"shard{i}.json"
        with open(path, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    query = start_contract_monitor(
        spark.readStream.schema("station string, ts timestamp, temp double")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir)),
        str(work / "contract_log"),
        str(work / "ckpt"),
        checks=contract(),
        unique_key=["station", "ts"],
        quarantine_dir=str(work / "stream_quarantine"),
        available_now=True,
    )
    query.awaitTermination()
    print("== streaming contract log (one report per micro-batch)")
    spark.read.parquet(str(work / "contract_log")).orderBy(
        "batch_id", "check"
    ).show(truncate=False)

    # --- 3. the producer upgrades: humidity column appears -------------
    v2 = ts_rows(
        spark,
        [("s2", "2024-03-01T04:00:00", 16.0, 55.0)],
        "station string, ts timestamp, temp double, humidity double",
    )
    try:
        wh.append(v2, verify=False)
    except ValueError as exc:
        print(f"strict append refused (as designed): {exc}")
    wh.append(v2, verify=False, evolve_schema=True)

    # --- 4. a stale producer replays an old-schema batch ---------------
    replayed = wh.merge_upsert(clean)  # exact replay: no-op
    assert replayed == 0
    late = ts_rows(
        spark,
        [("s3", "2024-03-01T05:00:00", 11.0)],
        "station string, ts timestamp, temp double",
    )
    wh.merge_upsert(late)  # old schema still accepted: humidity -> NULL

    # --- 5. the contract grows with the schema --------------------------
    widened = contract() + [X.accepted_range("humidity", 0.0, 100.0)]
    print("== contract over the evolved table (humidity NULLs exempt)")
    X.check_contract(
        wh.read(), widened, unique_key=["station", "ts"]
    ).show(truncate=False)
    print("== table after evolution")
    wh.read().orderBy("station", "ts").show(truncate=False)
    print("== audit trail")
    wh.maintenance_log().show(truncate=False)
    final = wh.read()
    return {
        "batch_failed_checks": report.filter("NOT passed").count(),
        "stream_failed_checks": spark.read.parquet(str(work / "contract_log"))
        .filter("NOT passed").count(),
        "stream_quarantined": spark.read.parquet(
            str(work / "stream_quarantine")
        ).count(),
        "rows": final.count(),
        "humidity_nulls": final.filter("humidity IS NULL").count(),
        "evolutions": wh.maintenance_log()
        .filter("op = 'evolve_schema'").count(),
    }


def main() -> None:
    run_checks(get_spark("data-contracts-demo"))


if __name__ == "__main__":
    main()
