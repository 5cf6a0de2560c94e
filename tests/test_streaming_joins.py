"""Stream-stream interval join: cross-batch matching + outer-join
watermark semantics.

Micro-batch order is forced with ``maxFilesPerTrigger=1`` (mtime-staged
shards, the test_stateful_streaming convention) so cross-batch state
behavior is deterministic: a side arriving in a later batch must still
match buffered rows, and left-outer NULL rows must emit only once the
watermark proves no match can arrive.
"""

from __future__ import annotations

import itertools
import json
import os

from data_engineering_datawarehousingandetlpipeline_spark.streaming.joins import (
    attribution_join,
)

_MTIME = itertools.count(1_800_000_000, 60)

EVENTS_DDL = "event_id long, user_id long, ts timestamp, event_type string"


def _write(path, rows):
    with open(path, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    stamp = next(_MTIME)
    os.utime(path, (stamp, stamp))


def _ev(eid, uid, ts, etype):
    return {"event_id": eid, "user_id": uid, "ts": ts, "event_type": etype}


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


def _source(spark, indir):
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .json(str(indir))
    )


def test_inner_join_matches_across_micro_batches(spark, tmp_path):
    """A purchase buffered in batch 1 must match a click arriving in
    batch 2 (and vice versa) — the state store holds each side until the
    watermark passes its horizon."""
    indir = tmp_path / "ev"
    indir.mkdir()
    _write(indir / "b1.json", [
        _ev(1, 1, "2024-03-01T10:00:00Z", "click"),
        _ev(2, 1, "2024-03-01T10:30:00Z", "purchase"),   # pairs with 1
        _ev(3, 2, "2024-03-01T10:40:00Z", "purchase"),   # click comes in b2
    ])
    _write(indir / "b2.json", [
        _ev(4, 2, "2024-03-01T10:20:00Z", "click"),      # pairs with 3
        _ev(5, 1, "2024-03-01T11:30:00Z", "click"),      # purchase in b3
        _ev(6, 3, "2024-03-01T08:00:00Z", "click"),      # outside any horizon
    ])
    _write(indir / "b3.json", [
        _ev(7, 1, "2024-03-01T11:45:00Z", "purchase"),   # pairs with 5
        _ev(8, 3, "2024-03-01T10:00:00Z", "purchase"),   # click 6 is 2 h prior
    ])

    stream = _source(spark, indir)
    pairs = attribution_join(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'purchase'"),
        horizon_seconds=3600,
        watermark_seconds=24 * 3600,  # generous: nothing drops, state holds
    )
    _drain(pairs, "attr_inner")
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.table("attr_inner").collect()
    }
    assert got == {(2, 1), (3, 4), (7, 5)}


def test_left_outer_emits_unmatched_only_past_watermark(spark, tmp_path):
    """Unconverted purchases emit NULL click columns once the watermark
    passes purchase_ts + horizon; younger unmatched rows stay in state."""
    indir = tmp_path / "ev"
    indir.mkdir()
    _write(indir / "b1.json", [
        _ev(1, 1, "2024-03-01T10:00:00Z", "click"),
        _ev(2, 1, "2024-03-01T10:30:00Z", "purchase"),   # matched
        _ev(3, 2, "2024-03-01T10:40:00Z", "purchase"),   # never matched
    ])
    # sentinel advances event time to 20:00 → watermark 20:00 after b2
    _write(indir / "b2.json", [_ev(90, 99, "2024-03-01T20:00:00Z", "click")])
    # b3 runs WITH operative watermark 20:00 > 10:40 + 1 h → NULL row for 3;
    # its own purchase (20:30) is younger than any possible watermark and
    # must stay in state, not emit
    _write(indir / "b3.json", [_ev(91, 98, "2024-03-01T20:30:00Z", "purchase")])

    stream = _source(spark, indir)
    pairs = attribution_join(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'purchase'"),
        horizon_seconds=3600,
        watermark_seconds=0,
        how="left_outer",
    )
    _drain(pairs, "attr_outer")
    rows = {r.purchase_id: r.click_id for r in spark.table("attr_outer").collect()}
    assert rows[2] == 1            # matched pair
    assert rows[3] is None         # unmatched, emitted after watermark
    assert 91 not in rows          # open tail stays in state


def test_enrich_stream_broadcasts_dim_into_every_batch(spark, tmp_path):
    """Stream-static enrichment: the dimension applies in EVERY
    micro-batch (not just the first), unknown keys survive with NULLs
    (left outer), and no state accumulates between batches."""
    from data_engineering_datawarehousingandetlpipeline_spark.streaming.joins import (
        enrich_stream,
    )

    indir = tmp_path / "ev"
    indir.mkdir()
    _write(indir / "b1.json", [_ev(1, 1, "2024-03-01T10:00:00Z", "view")])
    _write(indir / "b2.json", [
        _ev(2, 2, "2024-03-01T11:00:00Z", "view"),
        _ev(3, 77, "2024-03-01T12:00:00Z", "view"),   # not in the dim
    ])

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = _source(spark, indir)
    q = (
        enrich_stream(stream, dim, ["user_id"])
        .select("event_id", "user_id", "tier")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.event_id: r.tier for r in spark.table("enriched").collect()}
    assert got == {1: "gold", 2: "silver", 3: None}
    # stateless: no stateful operator appears in the final progress
    last = q.lastProgress
    assert not last["stateOperators"]
