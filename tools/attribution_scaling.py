"""Shard-scaling measurement for the stream-stream interval join
(streaming/joins.attribution_join).

Drains the SAME time-ordered event corpus at 3 vs 12 shards
(micro-batches) and records output pairs, peak and final state-store
rows, and per-batch wall time. What the numbers must show for the
100 TB story:

- the output pair set is shard-invariant (how the stream is micro-batched
  cannot change the join result);
- state is WINDOW-bounded, not history-bounded: rows are evicted as the
  watermark passes ``ts + horizon``, so the FINAL state size reflects the
  last ~(horizon + delay) of events, far below the corpus size, and the
  PEAK is bounded by the densest window — both roughly shard-count
  independent;
- per-batch time stays flat as shard count grows (each batch does
  proportionally less work).

Usage: ``python tools/attribution_scaling.py`` (SPARK_GRAFT_SF_DIR
overrides the corpus dir; prints one JSON line per shard count, then a
COVERAGE.md-ready summary).
"""

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)
from data_engineering_datawarehousingandetlpipeline_spark.streaming.joins import (
    attribution_join,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
HORIZON_S = 3600
WATERMARK_S = 3600

spark = get_spark(
    app_name="attribution-scaling", master="local[8]", shuffle_partitions=8
)
spark.sparkContext.setLogLevel("ERROR")

#: the corpus, time-ordered — event time must advance across shards so
#: the watermark moves and state eviction actually happens (the thing
#: being measured).
events = [
    (r["event_id"], r["user_id"], r["ts"].isoformat(), r["event_type"])
    for r in load_table(spark, SF, "events")
    .select("event_id", "user_id", "ts", "event_type")
    .filter(F.col("event_type").isin("click", "purchase"))
    .orderBy("ts", "event_id")
    .collect()
]


def write_shards(indir: str, n_shards: int) -> None:
    chunk = (len(events) + n_shards - 1) // n_shards
    for s in range(n_shards):
        path = os.path.join(indir, f"shard{s:03d}.json")
        with open(path, "w") as fh:
            for eid, uid, ts, etype in events[s * chunk : (s + 1) * chunk]:
                fh.write(
                    json.dumps(
                        {"event_id": eid, "user_id": uid,
                         "ts": ts, "event_type": etype}
                    ) + "\n"
                )
        stamp = 1_700_000_000 + 60 * s
        os.utime(path, (stamp, stamp))


def run(n_shards: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"attr-scale-{n_shards}-")
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    write_shards(indir, n_shards)
    src = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(indir)
    )
    pairs = attribution_join(
        src.filter("event_type = 'click'"),
        src.filter("event_type = 'purchase'"),
        horizon_seconds=HORIZON_S,
        watermark_seconds=WATERMARK_S,
    )
    name = f"attr_scale_{uuid.uuid4().hex}"
    t0 = time.monotonic()
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    states = [
        op["numRowsTotal"]
        for p in progress
        for op in p.get("stateOperators", [])
    ]
    durs = [p["durationMs"]["triggerExecution"] / 1000 for p in progress]
    out = spark.table(name)
    rec = {
        "shards": n_shards,
        "batches": len(progress),
        "out_pairs": out.count(),
        "out_hash": out.selectExpr(
            "sum(hash(purchase_id, click_id)) AS h"
        ).first()["h"],
        "peak_state_rows": max(states, default=0),
        "final_state_rows": states[-1] if states else 0,
        "wall_s": round(wall, 2),
        "mean_batch_s": round(sum(durs) / len(durs), 3) if durs else None,
    }
    print(json.dumps(rec), flush=True)
    shutil.rmtree(work)
    return rec


if __name__ == "__main__":
    rows = [run(3), run(12)]
    a, b = rows
    assert a["out_pairs"] == b["out_pairs"] and a["out_hash"] == b["out_hash"], (
        "output must be shard-invariant"
    )
    print(
        f"| shards | batches | pairs | peak state | final state | wall | "
        f"mean batch |\n|---|---|---|---|---|---|---|"
    )
    for r in rows:
        print(
            f"| {r['shards']} | {r['batches']} | {r['out_pairs']} | "
            f"{r['peak_state_rows']} | {r['final_state_rows']} | "
            f"{r['wall_s']} s | {r['mean_batch_s']} s |"
        )
    n_events = len(events)
    print(f"(corpus: {n_events} click/purchase events)")
    spark.stop()
