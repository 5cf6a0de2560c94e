"""Custom Python Data Source (Spark 4 API): batch + streaming formats.

The batch source must partition BY STATION (the fetch-parallelism unit),
produce the raw string-typed dirtiness contract, and feed apply_schema
identically to the file path; the streaming source must respect its
rate limit (multiple micro-batches), deliver every row exactly once
within a run, and stay availableNow-drainable.
"""

from __future__ import annotations

import json
import os

import pytest

from data_engineering_datawarehousingandetlpipeline_spark.sources.python_datasource import (
    register,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "sample_observations.json"
)


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def test_batch_source_partitions_by_station(registered):
    spark = registered
    df = (
        spark.read.format("fmi_observations")
        .option("sample_path", FIXTURE)
        .load()
    )
    with open(FIXTURE) as fh:
        fixture_rows = json.load(fh)
    assert df.count() == len(fixture_rows)
    assert [f.dataType.simpleString() for f in df.schema.fields] == (
        ["string"] * len(df.columns)
    )  # the dirtiness contract: everything lands as string
    # one input partition per station (fetch parallelism + retry isolation)
    stations = {str(r["station_id"]) for r in fixture_rows}
    assert df.rdd.getNumPartitions() == len(stations)

    # station selection prunes the fetch list
    one = (
        spark.read.format("fmi_observations")
        .option("sample_path", FIXTURE)
        .option("stations", next(iter(sorted(stations))))
        .load()
    )
    assert 0 < one.count() < len(fixture_rows)
    assert one.rdd.getNumPartitions() == 1


def test_batch_source_feeds_shared_cleaning_pipeline(registered):
    spark = registered
    from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
        read_observations_json,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
        clean_batch,
    )

    via_source = clean_batch(
        spark.read.format("fmi_observations")
        .option("sample_path", FIXTURE)
        .load()
    )
    via_file = clean_batch(read_observations_json(spark, FIXTURE))
    a = sorted(map(tuple, via_source.collect()))
    b = sorted(map(tuple, via_file.collect()))
    assert a == b  # same rows through either ingestion path


def test_stream_source_rate_limits_and_delivers_exactly_once(registered, tmp_path):
    spark = registered
    q = (
        spark.readStream.format("fmi_observations_stream")
        .option("sample_path", FIXTURE)
        .option("rows_per_batch", "2")
        .option("parallelism", "2")
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # Python stream sources don't support availableNow (the engine warns
    # and falls back to one batch) — drain via processAllAvailable, which
    # waits until latestOffset stops advancing
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    with open(FIXTURE) as fh:
        fixture_rows = json.load(fh)
    got = spark.table("pyds_stream")
    assert got.count() == len(fixture_rows)            # all rows, no dupes
    assert got.select("station_id", "timestamp").distinct().count() == len(
        fixture_rows
    )
    batches = [
        p for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert len(batches) >= 3                           # 6 rows / 2 per batch
    assert max(p["numInputRows"] for p in batches) <= 2


def test_stream_source_feeds_exactly_once_warehouse_ingestion(registered, tmp_path):
    """Composition: the custom streaming format drives the SAME ingestion
    pipeline as the file/Kafka sources — clean + idempotent MERGE into
    the warehouse — proving the source is a drop-in transport."""
    spark = registered
    from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
        make_batch_sink,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    wh = WarehouseTable(spark, str(tmp_path / "wh"))
    src = (
        spark.readStream.format("fmi_observations_stream")
        .option("sample_path", FIXTURE)
        .option("rows_per_batch", "2")
        .load()
    )
    q = (
        src.writeStream.foreachBatch(make_batch_sink(wh))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    assert wh.count() == 5  # fixture cleans to 5 hourly-deduped rows


def test_stream_source_restart_from_checkpoint_does_not_duplicate(
    registered, tmp_path
):
    """A second run against the same checkpoint must land zero new rows
    in the warehouse: the committed offset resumes, the cursor re-sync
    clamp in partitions() keeps the fresh reader from rewinding, and the
    MERGE sink absorbs any WAL-replayed batch."""
    spark = registered
    from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
        make_batch_sink,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    wh = WarehouseTable(spark, str(tmp_path / "wh"))

    def drain():
        q = (
            spark.readStream.format("fmi_observations_stream")
            .option("sample_path", FIXTURE)
            .option("rows_per_batch", "2")
            .load()
            .writeStream.foreachBatch(make_batch_sink(wh))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    drain()
    assert wh.count() == 5
    drain()  # restart: fresh reader, same checkpoint
    assert wh.count() == 5  # nothing re-lands
