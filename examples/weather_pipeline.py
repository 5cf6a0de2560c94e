#!/usr/bin/env python
"""End-to-end reference-shaped pipeline demo.

Reproduces the reference's full data path (SURVEY.md §3) on the Spark
engine, in one process:

    raw JSON observations → streaming ingest (file source standing in for
    Kafka) → clean (schema, hour floor, keep-last dedup) → idempotent MERGE
    into the date-partitioned warehouse → dashboard day-window query +
    duplicate audit + watermark state.

Run: ``python examples/weather_pipeline.py`` (uses a temp warehouse).
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.plans.reference_queries import (
    day_bounds_utc,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
    read_json_file_stream,
    run_available,
)
from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
    WarehouseTable,
)

FIXTURE = Path(__file__).resolve().parent.parent / "tests/fixtures/sample_observations.json"


def main() -> None:
    spark = get_spark(app_name="weather-pipeline-demo", master="local[4]")
    with tempfile.TemporaryDirectory() as tmp:
        incoming = Path(tmp, "incoming")
        incoming.mkdir()
        rows = json.loads(FIXTURE.read_text())
        # two "Kafka" micro-batches, replayed twice to prove idempotence
        for i, chunk in enumerate((rows[:3], rows[3:])):
            with open(incoming / f"batch{i}.json", "w") as fh:
                for row in chunk:
                    fh.write(json.dumps({k: None if v is None else str(v) for k, v in row.items()}) + "\n")

        warehouse = WarehouseTable(spark, str(Path(tmp, "warehouse")))
        run_available(read_json_file_stream(spark, str(incoming)), warehouse, str(Path(tmp, "ckpt1")))
        n_first = warehouse.count()
        run_available(read_json_file_stream(spark, str(incoming)), warehouse, str(Path(tmp, "ckpt2")))
        n_replay = warehouse.count()
        print(f"warehouse rows after ingest: {n_first}; after full replay: {n_replay}")
        assert n_first == n_replay, "replay must not double-load"

        start, end = day_bounds_utc(dt.date(2024, 3, 1))
        day = (
            warehouse.read()
            .select("station_id", "station_name", "timestamp", "temperature", "humidity")
            .filter(F.col("timestamp").between(str(start), str(end)))
            .orderBy("timestamp", "station_id")
        )
        print("dashboard day window:")
        for r in day.collect():
            print("  ", r["station_id"], r["timestamp"], r["temperature"])

        dups = (
            warehouse.read()
            .groupBy("station_id", "timestamp")
            .count()
            .filter(F.col("count") > 1)
        )
        print("duplicate audit rows:", dups.count())
        assert dups.count() == 0

        state = warehouse.max_ts_per_key().orderBy("station_id")
        print("watermark state:")
        for r in state.collect():
            print("  ", r["station_id"], "->", r["max_ts"])
    print("OK")


if __name__ == "__main__":
    main()
