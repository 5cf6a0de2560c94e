"""Streaming telemetry recorder: the engine's per-batch progress as rows.

Listener events arrive on Spark's event-bus thread asynchronously, so the
assertions poll-wait for the expected batch count before reading — the
same discipline a production flush loop needs.
"""

from __future__ import annotations

import itertools
import json
import os
import time

from data_engineering_datawarehousingandetlpipeline_spark.streaming.monitor import (
    METRICS_DDL,
    attach,
    detach,
)
from data_engineering_datawarehousingandetlpipeline_spark.streaming.stateful import (
    windowed_stats,
)

_MTIME = itertools.count(1_800_000_000, 60)

OBS_DDL = "station_id string, timestamp timestamp, temperature double"


def _write(path, rows):
    with open(path, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    stamp = next(_MTIME)
    os.utime(path, (stamp, stamp))


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _wait_for(rec, name, n_batches, timeout_s=30.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        rows = [r for r in rec.rows() if r[0] == name]
        if len(rows) >= n_batches:
            return rows
        time.sleep(0.2)
    raise AssertionError(
        f"listener delivered {len(rows)} of {n_batches} expected batches"
    )


def test_recorder_captures_rows_state_and_watermark(spark, tmp_path):
    indir = tmp_path / "obs"
    indir.mkdir()
    _write(indir / "b1.json", [
        {"station_id": "A", "timestamp": "2024-03-01T10:00:00Z", "temperature": 1.0},
        {"station_id": "A", "timestamp": "2024-03-01T10:10:00Z", "temperature": 3.0},
    ])
    _write(indir / "b2.json", [
        {"station_id": "B", "timestamp": "2024-03-01T12:30:00Z", "temperature": 6.0},
    ])

    rec = attach(spark)
    try:
        source = (
            spark.readStream.schema(OBS_DDL)
            .option("maxFilesPerTrigger", "1")
            .json(str(indir))
        )
        _drain(windowed_stats(source), "mon_stats")
        rows = _wait_for(rec, "mon_stats", 2)
    finally:
        detach(spark, rec)

    # one metrics row per micro-batch; input rows account for every
    # staged record; the stateful aggregate reports live state; the
    # watermark advances once the first batch's max event time is seen
    by_batch = {r[2]: r for r in rows}
    assert set(by_batch) >= {0, 1}
    assert sum(r[4] for r in rows) == 3
    assert any(r[7] > 0 for r in rows)  # state_rows
    assert any(r[10] and r[10] > "2024-03-01T00:00:00" for r in rows)
    # the DataFrame surface carries the declared schema
    df = rec.metrics_df(spark)
    assert df.schema.simpleString() == (
        spark.createDataFrame([], METRICS_DDL).schema.simpleString()
    )
    assert df.filter("query_name = 'mon_stats'").count() == len(rows)


def test_drain_rows_truncates_and_detach_stops_recording(spark, tmp_path):
    indir = tmp_path / "obs2"
    indir.mkdir()
    _write(indir / "b1.json", [
        {"station_id": "A", "timestamp": "2024-03-01T10:00:00Z", "temperature": 1.0},
    ])

    rec = attach(spark)
    try:
        source = spark.readStream.schema(OBS_DDL).json(str(indir))
        _drain(windowed_stats(source), "mon_drain")
        _wait_for(rec, "mon_drain", 1)
        drained = rec.drain_rows()
        assert any(r[0] == "mon_drain" for r in drained)
        assert rec.rows() == []  # flush truncates the buffer
    finally:
        detach(spark, rec)

    # after detach, further queries leave the buffer untouched
    _write(indir / "b2.json", [
        {"station_id": "A", "timestamp": "2024-03-01T11:00:00Z", "temperature": 2.0},
    ])
    source = spark.readStream.schema(OBS_DDL).json(str(indir))
    _drain(windowed_stats(source), "mon_after_detach")
    time.sleep(1.0)  # give stray events a chance to (wrongly) arrive
    assert all(r[0] != "mon_after_detach" for r in rec.rows())


def test_max_rows_cap_drops_oldest_and_counts(spark):
    """A neglected recorder with max_rows set must plateau at the cap,
    evicting OLDEST rows first and counting what it lost — no Spark query
    needed: the eviction is pure buffer discipline on the callback path."""
    from types import SimpleNamespace

    from data_engineering_datawarehousingandetlpipeline_spark.streaming.monitor import (
        ProgressRecorder,
    )

    rec = ProgressRecorder(max_rows=3)
    for batch_id in range(7):
        progress = json.dumps(
            {"name": "q", "id": "id", "batchId": batch_id, "numInputRows": 1}
        )
        rec.onQueryProgress(
            SimpleNamespace(progress=SimpleNamespace(json=progress))
        )
    rows = rec.rows()
    assert len(rows) == 3
    assert [r[2] for r in rows] == [4, 5, 6]  # newest kept, oldest evicted
    assert rec.dropped_rows == 4
    # drain resets the buffer but not the loss counter (it is cumulative)
    assert len(rec.drain_rows()) == 3
    assert rec.rows() == [] and rec.dropped_rows == 4


def test_max_rows_rejects_nonpositive():
    import pytest as _pytest

    from data_engineering_datawarehousingandetlpipeline_spark.streaming.monitor import (
        ProgressRecorder,
    )

    with _pytest.raises(ValueError, match="max_rows"):
        ProgressRecorder(max_rows=0)
