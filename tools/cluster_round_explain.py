"""Dump the near_dup_clusters ROUND plans (r17 evidence).

The propagation loop's per-round plans are invisible in a registered
query's final explain (each round ends in a localCheckpoint, so the
final plan shows one `Scan ExistingRDD`). This tool replays the loop on
the sf0.1 cluster-family pair graph and writes round 2's `merged` plan
under BOTH strategies to plans/$PLANS_ROUND/:

- cluster_round_broadcast.txt — the r17 broadcast-frontier round
  (frontier count under FRONTIER_BROADCAST_MAX_ROWS)
- cluster_round_shuffle.txt   — the pre-r17 shuffle round (forced via
  FRONTIER_BROADCAST_MAX_ROWS = 0), the at-scale fallback

Usage: python tools/cluster_round_explain.py
"""

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_datawarehousingandetlpipeline_spark.operators import dedup as dd
from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
    cluster_pairs,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)


class _RoundCapture:
    """Patch localCheckpoint-free: capture round-2 merged plans by running
    near_dup_clusters with an instrumented max_iterations."""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r17")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="cluster-round-explain")
    docs = load_table(spark, sf_dir, "documents")
    pairs = cluster_pairs(docs)

    # Replay the loop body exactly as near_dup_clusters does, stopping to
    # explain round 2's merged DataFrame before it is checkpointed.
    from pyspark.sql import functions as F

    docs_d = docs.select(F.col("doc_id").alias("doc")).distinct()
    directed = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels0 = docs_d.select("doc", F.col("doc").alias("label")).localCheckpoint()
    nm1 = (
        edges.groupBy("dst")
        .agg(F.min("src").alias("nmin"))
        .select(F.col("dst").alias("doc"), "nmin")
    )
    merged1 = (
        labels0.join(nm1, "doc", "left")
        .select(
            "doc",
            F.least(F.col("label"), F.col("nmin")).alias("label"),
            (F.col("nmin") < F.col("label")).alias("improved"),
        )
        .localCheckpoint()
    )
    labels = merged1.select("doc", "label")
    frontier = merged1.filter(F.col("improved")).select("doc", "label")
    n_frontier = frontier.count()
    print(f"round-2 frontier: {n_frontier} rows")

    def dump(df, name):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / name).write_text(
            f"-- round-2 merged plan ({name}); frontier={n_frontier} rows\n"
            + buf.getvalue()
        )
        print(f"wrote {name}")

    # broadcast round (the r17 path)
    f = frontier
    nm = (
        edges.join(
            F.broadcast(
                f.select(F.col("doc").alias("src"), F.col("label").alias("flabel"))
            ),
            "src",
        )
        .groupBy("dst")
        .agg(F.min("flabel").alias("cand"))
        .select(F.col("dst").alias("doc"), "cand")
    )
    jt = labels.join(
        F.broadcast(
            f.select(F.col("doc").alias("fnode"), F.col("label").alias("jlabel"))
        ),
        F.col("label") == F.col("fnode"),
    ).select("doc", F.col("jlabel").alias("cand"))
    upds = nm.union(jt).groupBy("doc").agg(F.min("cand").alias("cand"))
    res = (
        labels.alias("l")
        .join(F.broadcast(upds.alias("u")), F.col("l.doc") == F.col("u.cand"))
        .select(
            F.col("u.doc").alias("doc"),
            F.least(F.col("u.cand"), F.col("l.label")).alias("cand"),
        )
    )
    merged_b = labels.join(F.broadcast(res), "doc", "left").select(
        "doc",
        F.least(F.col("label"), F.col("cand")).alias("label"),
        (F.col("cand") < F.col("label")).alias("improved"),
    )
    dump(merged_b, "cluster_round_broadcast.txt")

    # shuffle round (pre-r17 shape / at-scale fallback)
    neighbor_min = (
        edges.join(
            frontier.select(F.col("doc").alias("src"), F.col("label").alias("flabel")),
            "src",
        )
        .groupBy("dst")
        .agg(F.min("flabel").alias("nmin"))
        .select(F.col("dst").alias("doc"), "nmin")
    )
    cand = labels.join(neighbor_min, "doc", "left").select(
        "doc",
        F.col("label").alias("old"),
        F.least(F.col("label"), F.col("nmin")).alias("c1"),
    )
    lut = labels.select(F.col("doc").alias("c1"), F.col("label").alias("c2"))
    merged_s = cand.join(lut, "c1", "left").select(
        "doc",
        F.least(F.col("c1"), F.col("c2")).alias("label"),
        (F.least(F.col("c1"), F.col("c2")) < F.col("old")).alias("improved"),
    )
    dump(merged_s, "cluster_round_shuffle.txt")


if __name__ == "__main__":
    main()
