"""r13 adjudication of the doc_minhash_neardup driver-bench residual.

BENCH_r12 (driver) read 7.877 s vs 6.399 s in BENCH_r11 — 1.23x raw
against a 0.72x all-else median, the only non-uniform mover and above
the standing 1.2x tripwire (r12 verdict, "What's wrong #1" / marching
order 3). No commit touched the query between the rounds, and
TIMINGS_r12 read it at 3.889 s (0.72x of r11, riding the calm), so the
hypothesis is warm-up/host variance, with one structural suspect: in
the bench tier the query's 4 measured passes are INTERLEAVED with 21
other headline queries (bench.py rationale), while TIMINGS measures it
consecutively — if the interleaving itself costs (JIT/codegen-cache
pressure from ~22 plans x several codegen stages vs the JVM's fixed
100-entry generated-class cache), the bench-tier number would sit
structurally above the consecutive number in EVERY round, and the r12
move would just be that structural gap breathing with the host.

Protocol (one session, same sf0.1 tables as the driver bench):
1. phase probe (day_window, the standing calm/hot meter) before/between;
2. CONSECUTIVE trajectory: 8 back-to-back executions of
   doc_minhash_neardup through the noop sink (execution 1..8, shows the
   compile/JIT curve and the isolated steady state);
3. INTERLEAVED replication: 2 warm-ups + best-of-4 interleaved across
   the full 22-query headline tier — bench.py's exact tier-1 protocol —
   reporting doc_minhash_neardup's best-of-4 beside the tier total.

Interpretation rule (standing >1.2x tripwire): if the interleaved
best-of-4 lands near TIMINGS/consecutive steady state, the r12 driver
reading was host weather — record and close. If interleaved
reproducibly sits >1.2x above consecutive IN THE SAME CALM SESSION,
the gap is structural measurement protocol, not a regression — record
the split so future round-over-round bench deltas on this query are
read against the right baseline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark


def run_noop(spec, spark, sf_dir):
    start = time.perf_counter()
    spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - start, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-minhash-r13")
    queries = all_queries()
    probe = queries["day_window"]
    target = queries["doc_minhash_neardup"]

    out = {"sf_dir": sf_dir}
    out["probe_before"] = [run_noop(probe, spark, sf_dir) for _ in range(3)]

    out["consecutive_trajectory"] = [run_noop(target, spark, sf_dir) for _ in range(8)]
    out["probe_mid"] = [run_noop(probe, spark, sf_dir) for _ in range(3)]

    # bench.py tier-1 replication: 2 warm-ups + interleaved best-of-4
    tier = {n: s for n, s in queries.items() if s.bench}
    for _ in range(2):
        for name in sorted(tier):
            run_noop(tier[name], spark, sf_dir)
    best = {n: float("inf") for n in tier}
    for _ in range(4):
        for name in sorted(tier):
            spark._jvm.System.gc()
            best[name] = min(best[name], run_noop(tier[name], spark, sf_dir))
    out["interleaved_best_of_4"] = round(best["doc_minhash_neardup"], 3)
    out["tier_total"] = round(sum(best.values()), 3)
    out["tier_best"] = {n: round(t, 3) for n, t in sorted(best.items())}
    out["probe_after"] = [run_noop(probe, spark, sf_dir) for _ in range(3)]

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
