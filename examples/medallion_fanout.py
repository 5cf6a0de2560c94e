#!/usr/bin/env python
"""Medallion fan-out: one bronze table, many independent stream consumers.

The reference's topology is a straight line — one Kafka topic, ONE consumer,
one table (`src/data_processing/kafka_stream.py:287-361`); adding a second
reader means a second consumer group and a second ingestion path. The
lakehouse topology inverts that: ingestion appends to a BRONZE table once,
and any number of downstream streams tail the table itself
(`WarehouseTable.stream_source`, Delta's readStream-on-a-table analogue),
each from its own checkpoint cursor:

    raw JSON → streaming ingest → bronze (append-only, versioned)
        ├── consumer A: stream-static dim enrichment → silver table
        └── consumer B: hourly per-station rollup → gold table

Both consumers drain incrementally — a second ingestion batch re-runs them
and each processes ONLY the new rows. Run:
``python examples/medallion_fanout.py`` (temp dirs, exits 0 on success).
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
    clean_batch,
    read_json_file_stream,
    run_available,
)
from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
    WarehouseTable,
)

FIXTURE = Path(__file__).resolve().parent.parent / "tests/fixtures/sample_observations.json"

#: tiny station dimension (the broadcast side of consumer A) — in
#: production this is a reference table maintained elsewhere
REGIONS = {
    "100001": "south", "100002": "south", "100003": "coast",
    "100004": "north", "100005": "north", "100010": "coast",
}


def drain_fanout(spark, bronze, silver, gold, ckpt_a, ckpt_b, dim):
    """Run both downstream consumers to the end of the bronze table."""

    def enrich(batch, _epoch):
        if batch.isEmpty():
            return
        silver.merge_upsert(
            batch.join(F.broadcast(dim), "station_id", "left")
        )

    def rollup(batch, _epoch):
        if batch.isEmpty():
            return
        # per-hour conditional re-aggregation: the merge keeps it idempotent
        hourly = (
            batch.groupBy(
                "station_id", F.date_trunc("hour", "timestamp").alias("timestamp")
            )
            .agg(F.avg("temperature").alias("avg_temp"), F.count("*").alias("n_obs"))
        )
        gold.merge_replace(hourly)

    for source, sink, ckpt in (
        (bronze.stream_source(), enrich, ckpt_a),
        (bronze.stream_source(), rollup, ckpt_b),
    ):
        q = (
            source.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()


def main() -> int:
    spark = get_spark(app_name="medallion-fanout", master="local[4]", shuffle_partitions=4)
    with tempfile.TemporaryDirectory() as root:
        root = Path(root)
        incoming = root / "incoming"
        incoming.mkdir()
        bronze = WarehouseTable(spark, str(root / "bronze"), track_versions=True)
        silver = WarehouseTable(spark, str(root / "silver"))
        gold = WarehouseTable(
            spark, str(root / "gold"), keys=["station_id", "timestamp"]
        )
        dim = spark.createDataFrame(
            list(REGIONS.items()), "station_id string, region string"
        )

        rows = json.loads(FIXTURE.read_text())
        (incoming / "batch1.json").write_text(
            "\n".join(json.dumps({k: None if v is None else str(v) for k, v in r.items()}) for r in rows[:4])
        )
        run_available(
            read_json_file_stream(spark, str(incoming)), bronze, str(root / "ckpt_ingest")
        )
        v1 = bronze.count()
        drain_fanout(spark, bronze, silver, gold,
                     str(root / "ckpt_a"), str(root / "ckpt_b"), dim)
        assert silver.count() == v1, (silver.count(), v1)
        print(f"batch 1: bronze={v1} silver={silver.count()} gold={gold.count()}")

        # second producer batch: consumers resume from their cursors and
        # see ONLY the new bronze files
        (incoming / "batch2.json").write_text(
            "\n".join(json.dumps({k: None if v is None else str(v) for k, v in r.items()}) for r in rows[4:])
        )
        run_available(
            read_json_file_stream(spark, str(incoming)), bronze, str(root / "ckpt_ingest")
        )
        drain_fanout(spark, bronze, silver, gold,
                     str(root / "ckpt_a"), str(root / "ckpt_b"), dim)
        assert silver.count() == bronze.count(), (silver.count(), bronze.count())

        enriched = {r["station_id"]: r["region"] for r in silver.read().collect()}
        assert enriched.get("100001") == "south"
        # gold equals a from-scratch batch rollup of bronze
        expect = (
            bronze.read()
            .groupBy("station_id", F.date_trunc("hour", "timestamp").alias("h"))
            .count()
            .count()
        )
        assert gold.count() == expect, (gold.count(), expect)
        print(f"batch 2: bronze={bronze.count()} silver={silver.count()} gold={gold.count()}")
        print("medallion fan-out OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
