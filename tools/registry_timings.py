"""Full-registry timing baseline: every batch query once-warm, best-of-2.

bench.py times the 22 headline queries with the 2-warmup/interleaved-
best-of-4 protocol; this tool sweeps the WHOLE registry (streaming and
staged-lifecycle queries excluded — their construction drains tempdir
shards, so wall time measures staging, not the plan) and writes
``TIMINGS_r{N}.json``: one best-of-2 noop-sink number per query. Purpose
is ROUND-OVER-ROUND regression visibility for the ~120 queries the
headline bench never times — a rotation-queue query that silently went
quadratic shows up here as an outlier against its last baseline, without
waiting for its next driver window slot.

Usage: python tools/registry_timings.py [round_number]
(SPARK_GRAFT_SF_DIR overrides the default sf0.1 tables.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark

#: construction stages tempdir shards / warehouse mutations — wall time
#: would measure staging, not the plan (same exclusion set as the plan
#: audit in tests/test_plan_quality.py).
EXCLUDED_PREFIXES = ("streaming_",)
EXCLUDED = {"warehouse_skipping_scan", "warehouse_time_travel", "warehouse_change_feed"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    spark = get_spark(app_name="registry-timings")
    specs = {
        n: s
        for n, s in all_queries().items()
        if not n.startswith(EXCLUDED_PREFIXES) and n not in EXCLUDED
    }
    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for attempt in range(3):  # warm-up + 2 timed
            spark._jvm.System.gc()
            start = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            if attempt:  # discard the codegen/JIT warm-up pass
                best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"TIMINGS_r{rnd}.json",
    )
    payload = {
        "sf_dir": sf_dir,
        "protocol": "per-query warm-up + best-of-2, noop sink, module order",
        "n_queries": len(timings),
        "total_sec": round(sum(timings.values()), 3),
        "queries": timings,
    }
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(timings)} queries, {payload['total_sec']}s total")


if __name__ == "__main__":
    main()
