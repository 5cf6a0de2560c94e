"""Stage the replica_scaling 4× corpus on import (shared by
tools/scale_isolates.py). Same layout, stride and shift columns as
tools/replica_scaling.py — kept in one place so the two tools can never
stage diverging corpora."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SCALE_DIR", "/tmp/replica_x4")
REPLICAS = 4
SHIFT = 100_000_000
SHIFT_COLS = {
    "events": ["user_id", "event_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def stage() -> None:
    if os.path.isdir(OUT) and all(
        os.path.exists(os.path.join(OUT, f"{t}.parquet")) for t in TABLES
    ):
        return
    spark = get_spark(app_name="replica-stage", master="local[32]")
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
    spark.stop()


stage()
