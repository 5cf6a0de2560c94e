"""Scale-isolate tier (r17, verdict item 6): heavy queries at 4× data,
32 vs 8 cores, recorded as SCALE_ISOLATES_r{N}.json.

The sf0.1 bench tier stopped measuring the engine: every headline query
is fixed-overhead-bound there (8-core/32-core ratio ≈ 1), so plan wins
hide under the ~0.3 s/query floor. This tool restores measurement
leverage WITHOUT touching bench.py's contract: it stages the
replica_scaling 4× corpus (id-shifted replicas ≈ sf0.4) and runs the
TIMINGS isolate protocol (2 warm-ups + best-of-3, noop sink) for the
heavy movers at local[32] AND local[8] in separate JVMs.

A query doing real parallel work shows an 8-core time well above its
32-core time at this tier; ratios ≈ 1 mean the query is still
per-plan-overhead-bound even at 4×.

Usage: python tools/scale_isolates.py <round> [query ...]
(defaults to the r17 heavy set; SPARK_GRAFT_SF_DIR overrides the 1×
base dir.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_QUERIES = [
    "doc_minhash_clusters",
    "doc_dedup_clusters",
    "dedup_cluster_stats",
    "doc_cluster_keep",
    "doc_minhash_neardup",
    "split_leakage_audit",
    "source_dup_matrix",
    "retrieval_rrf_ann",
    "emb_ivf_topk",
    "lineitem_profile",
]

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
names = sys.argv[3:]
spark = get_spark(app_name=f"scale-isolates-c{{cores}}", master=f"local[{{cores}}]")
out = {{}}
for name in names:
    fn = all_queries()[name].fn
    for _ in range(2):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    out[name] = round(best, 3)
    print(f"c{{cores}} {{name}}: {{out[name]}}s", file=sys.stderr, flush=True)
print(json.dumps(out))
"""


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    names = sys.argv[2:] or DEFAULT_QUERIES

    # stage the 4x dir with replica_scaling's layout (reuse its staging by
    # running its stage() through a tiny driver)
    import tools.replica_scaling_stage as _  # noqa: F401  (side-effect stage)

    out_dir = os.environ.get("SCALE_DIR", "/tmp/replica_x4")
    worker = _WORKER.format(repo=str(REPO))
    results: dict[str, dict] = {}
    for cores in (32, 8):
        proc = subprocess.run(
            [sys.executable, "-c", worker, str(cores), out_dir, *names],
            capture_output=True,
            text=True,
            cwd=str(REPO),
        )
        if proc.returncode != 0:
            print(proc.stderr[-4000:])
            raise SystemExit(f"worker c{cores} failed")
        results[f"c{cores}"] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(proc.stderr.strip().splitlines()[-len(names):], flush=True)

    merged = {
        "protocol": "replica_x4 (~sf0.4), 2 warm-ups + best-of-3, noop sink, "
        "fresh JVM per core count",
        "queries": {
            n: {
                "c32_sec": results["c32"][n],
                "c8_sec": results["c8"][n],
                "c8_over_c32": round(results["c8"][n] / results["c32"][n], 2),
            }
            for n in names
        },
    }
    path = REPO / f"SCALE_ISOLATES_r{rnd}.json"
    path.write_text(json.dumps(merged, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
