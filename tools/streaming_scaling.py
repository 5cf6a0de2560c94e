"""Replica-scaling measurement for the streaming dedup ladder (r7 verdict,
marching order 6): drain the SAME document corpus through each rung at 3
vs 12 shards (micro-batches) and record final state-store rows, output
rows, batch count, and wall/mean-batch time.

What the numbers must show for the 100 TB story:

- state rows are a function of DISTINCT CONTENT (exact: one per content
  hash; minhash: ≤16 band buckets per content), NOT of how the stream is
  sharded — 3-shard and 12-shard drains end at identical state sizes;
- output row sets are shard-invariant (the ladder's documented
  order-independence contract);
- per-batch wall time stays flat as shard count grows (each batch does
  proportionally less work), so total drain time is dominated by
  per-trigger overhead at test scale — batch count × small constant.

Usage: python tools/streaming_scaling.py  (SPARK_GRAFT_SF_DIR overrides
the corpus dir; prints one JSON line per (rung, shards) run, then a
summary table for COVERAGE.md.)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)
from data_engineering_datawarehousingandetlpipeline_spark.streaming import (
    pipeline as P,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
BASE_TS = "2024-03-01T00:00:00"

spark = get_spark(
    app_name="streaming-scaling", master="local[8]", shuffle_partitions=8
)
spark.sparkContext.setLogLevel("ERROR")

docs = [
    (r["doc_id"], r["text"])
    for r in load_table(spark, SF, "documents")
    .select("doc_id", "text")
    .orderBy("doc_id")
    .collect()
]


def write_shards(indir: str, n_shards: int) -> None:
    """Round-robin the corpus into n shards; mtimes force batch order.

    Event time = BASE_TS + doc_id seconds — deterministic, monotone
    within each shard, and spanning < 1 h so the windowed rungs hold all
    state (this measures scaling, not expiry; expiry is pytest-pinned).
    """
    import datetime

    base = datetime.datetime.fromisoformat(BASE_TS)
    chunk = (len(docs) + n_shards - 1) // n_shards
    for s in range(n_shards):
        path = os.path.join(indir, f"shard{s:03d}.json")
        with open(path, "w") as fh:
            for doc_id, text in docs[s * chunk : (s + 1) * chunk]:
                ts = (base + datetime.timedelta(seconds=int(doc_id))).isoformat()
                fh.write(
                    json.dumps({"doc_id": doc_id, "text": text, "ts": ts}) + "\n"
                )
        stamp = 1_700_000_000 + 60 * s
        os.utime(path, (stamp, stamp))


RUNGS = {
    "exact": (P.start_exact_dedup, {}),
    "windowed_exact": (P.start_windowed_exact_dedup, {"delay": "1 hour"}),
    "minhash": (P.start_minhash_dedup, {}),
    "windowed_minhash": (P.start_windowed_minhash_dedup, {"delay": "1 hour"}),
}


def run(rung: str, n_shards: int) -> dict:
    starter, kwargs = RUNGS[rung]
    work = tempfile.mkdtemp(prefix=f"ladder-{rung}-{n_shards}-")
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    write_shards(indir, n_shards)
    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(indir)
    )
    t0 = time.monotonic()
    q = starter(
        src,
        os.path.join(work, "out"),
        os.path.join(work, "ckpt"),
        available_now=True,
        **kwargs,
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    state_rows = max(
        (
            op["numRowsTotal"]
            for p in progress
            for op in p.get("stateOperators", [])
        ),
        default=0,
    )
    durs = [p["durationMs"]["triggerExecution"] / 1000 for p in progress]
    out_rows = spark.read.parquet(os.path.join(work, "out")).count()
    shutil.rmtree(work)
    rec = {
        "rung": rung,
        "shards": n_shards,
        "batches": len(progress),
        "state_rows": state_rows,
        "out_rows": out_rows,
        "wall_s": round(wall, 2),
        "mean_batch_s": round(sum(durs) / max(len(durs), 1), 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


results = [run(rung, n) for rung in RUNGS for n in (3, 12)]

print("\n| rung | shards | batches | state rows | out rows | wall s | mean batch s |")
print("|---|---|---|---|---|---|---|")
for r in results:
    print(
        f"| {r['rung']} | {r['shards']} | {r['batches']} | {r['state_rows']}"
        f" | {r['out_rows']} | {r['wall_s']} | {r['mean_batch_s']} |"
    )
by_rung: dict = {}
for r in results:
    by_rung.setdefault(r["rung"], {})[r["shards"]] = r
ok = all(
    v[3]["state_rows"] == v[12]["state_rows"]
    and v[3]["out_rows"] == v[12]["out_rows"]
    for v in by_rung.values()
)
print("\nSTATE/OUTPUT SHARD-INVARIANT:", "PASS" if ok else "FAIL")
spark.stop()
sys.exit(0 if ok else 1)
