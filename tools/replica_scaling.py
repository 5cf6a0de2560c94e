"""Replica-scaling harness: time registered queries at 1x vs 4x data.

Stages a 4x copy of the sf tables under /tmp with id-shifted replicas —
fact/entity ids shift by a large stride per replica so keys stay unique
and never collide with query-side filters (doc_id < 3 etc.); fixed-size
dimensions copy as-is (their real-world growth mode). Then times each
requested query on both dirs (2 warm-ups + best-of-3, interleaved, noop
sink) and prints a COVERAGE.md-ready line per query.

Usage: python tools/replica_scaling.py <query> [query ...]
"""

import os
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/replica_x4"
REPLICAS = 4
SHIFT = 100_000_000  # per-replica id stride: far above any natural id AND
# clear of query-side synthetic shifts (customer_snapshot_diff's insert
# stripe adds 10_000_000 — a stride equal to it would alias replica keys)

#: id columns shifted per replica; tables not listed are copied as-is
#: (region/nation/part/supplier are the fixed-size dims).
SHIFT_COLS = {
    "events": ["user_id", "event_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],  # o_custkey stays: facts grow, dims don't
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

spark = get_spark(
    app_name="replica-scaling", master="local[32]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")


def stage() -> None:
    if os.path.isdir(OUT) and all(
        os.path.exists(os.path.join(OUT, f"{t}.parquet")) for t in TABLES
    ):
        return
    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        base = load_table(spark, SF, t)
        if t in SHIFT_COLS:
            copies = []
            for i in range(REPLICAS):
                c = base
                for col in SHIFT_COLS[t]:
                    c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = base
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
        print(f"staged {t}", flush=True)


def time_query(name: str, sf_dir: str) -> float:
    fn = all_queries()[name].fn
    for _ in range(2):  # codegen + JIT warm-up
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


names = sys.argv[1:]
assert names, "pass query names"
stage()
for name in names:
    t1 = time_query(name, SF)
    t4 = time_query(name, OUT)
    n1 = all_queries()[name].fn(spark, SF).count()
    n4 = all_queries()[name].fn(spark, OUT).count()
    print(
        f"{name}: 1x={t1:.2f}s 4x={t4:.2f}s ratio={t4 / t1:.2f}x "
        f"rows {n1} -> {n4}",
        flush=True,
    )
spark.stop()
