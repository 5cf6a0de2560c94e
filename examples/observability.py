#!/usr/bin/env python
"""Data-observability demo: the monitoring loop an ingestion fleet runs.

The round-7/8 observability family in one runnable pass over the event
stream and the lineitem table:

    one-pass table profile (nulls / distincts / ranges per column)
    → exact per-type value percentiles (grouped order statistics,
      no one-task-per-group window)
    → Hampel rolling anomalies (trailing median/MAD flags per user)
    → silence report (who stopped sending, as of the anchored
      watermark — the batch twin of the streaming heartbeat)
    → snapshot CDC diff (what a correction feed would change, audited
      BEFORE merge_replace applies it).

Run: ``python examples/observability.py`` (uses the sf0.001 testdata).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_datawarehousingandetlpipeline_spark.plans.analytics import (
    q_customer_snapshot_diff,
    q_event_rolling_anomaly,
    q_event_value_percentiles,
    q_lineitem_profile,
    q_silence_report,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def run_checks(spark, sf_dir: str = SF_DIR) -> dict[str, int]:
    """The demo body, self-asserting; returns the headline counts."""
    profile = q_lineitem_profile(spark, sf_dir).collect()
    assert all(r.n_nulls == 0 for r in profile)  # testdata ships complete
    print(f"profile: {len(profile)} columns, all null-free")

    pct = q_event_value_percentiles(spark, sf_dir).collect()
    for r in pct:
        assert r.p25 <= r.p50 <= r.p75 <= r.p90
        print(
            f"  {r.event_type:<9} n={r.n_events:<5} "
            f"p25={r.p25:.2f} p50={r.p50:.2f} p75={r.p75:.2f} p90={r.p90:.2f}"
        )

    anomalies = q_event_rolling_anomaly(spark, sf_dir).collect()
    assert anomalies
    worst = max(anomalies, key=lambda r: abs(r.value - r.med) / r.mad)
    print(
        f"anomalies: {len(anomalies)} flagged; worst user={worst.user_id} "
        f"value={worst.value:.2f} vs med={worst.med:.2f} (mad={worst.mad:.2f})"
    )

    silent = q_silence_report(spark, sf_dir).collect()
    print(f"silence: {len(silent)} users quiet past the threshold")
    for r in silent:
        print(f"  user={r.user_id} last_seen={r.last_seen} events={r.n_events}")

    diff = q_customer_snapshot_diff(spark, sf_dir).collect()
    ops = {"insert": 0, "delete": 0, "update": 0}
    for r in diff:
        ops[r.op] += 1
    assert all(v > 0 for v in ops.values())
    print(f"correction-feed audit: {ops}")

    batches = run_telemetry(spark)

    return {
        "profile_cols": len(profile),
        "percentile_groups": len(pct),
        "anomalies": len(anomalies),
        "silent_users": len(silent),
        "diff_rows": len(diff),
        "telemetry_batches": batches,
    }


def run_telemetry(spark) -> int:
    """The dashboards-over-telemetry half: drive a two-batch stream with
    the session-scoped ProgressRecorder attached and query the captured
    per-batch engine metrics (rows, rate, state size, watermark) back
    through the engine itself."""
    import json
    import os
    import tempfile
    import time

    from data_engineering_datawarehousingandetlpipeline_spark.streaming.monitor import (
        attach,
        detach,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.streaming.stateful import (
        windowed_stats,
    )

    indir = tempfile.mkdtemp(prefix="obs_telemetry_")
    stamps = iter((1_900_000_000, 1_900_000_060))
    for name, rows in (
        ("b1.json", [
            {"station_id": "A", "timestamp": "2024-03-01T10:00:00Z", "temperature": 1.0},
            {"station_id": "A", "timestamp": "2024-03-01T10:10:00Z", "temperature": 3.0},
        ]),
        ("b2.json", [
            {"station_id": "B", "timestamp": "2024-03-01T12:30:00Z", "temperature": 6.0},
        ]),
    ):
        path = os.path.join(indir, name)
        with open(path, "w") as fh:
            fh.writelines(json.dumps(r) + "\n" for r in rows)
        s = next(stamps)
        os.utime(path, (s, s))

    rec = attach(spark)
    try:
        source = (
            spark.readStream
            .schema("station_id string, timestamp timestamp, temperature double")
            .option("maxFilesPerTrigger", "1")
            .json(indir)
        )
        q = (
            windowed_stats(source).writeStream.outputMode("append")
            .format("memory").queryName("obs_demo")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        deadline = time.time() + 30
        mine: list[tuple] = []
        while time.time() < deadline:
            mine = [r for r in rec.rows() if r[0] == "obs_demo"]
            if len(mine) >= 2:
                break
            time.sleep(0.2)
        else:
            # fail loudly as a listener timeout — falling through to the
            # row-count assertion would report a confusing wrong-sum error
            # for what is actually missing telemetry delivery
            raise TimeoutError(
                f"listener bus delivered {len(mine)}/2 expected progress "
                "events for obs_demo within 30 s"
            )
        metrics = rec.metrics_df(spark).filter("query_name = 'obs_demo'")
        report = metrics.selectExpr(
            "batch_id", "input_rows", "batch_ms", "state_rows", "watermark"
        ).orderBy("batch_id").collect()
        assert sum(r.input_rows for r in report) == 3
        for r in report:
            print(
                f"  batch={r.batch_id} rows={r.input_rows} "
                f"ms={r.batch_ms} state={r.state_rows} wm={r.watermark}"
            )
        print(f"telemetry: {len(report)} micro-batches recorded")
        return len(report)
    finally:
        detach(spark, rec)


if __name__ == "__main__":
    spark = get_spark("observability-demo")
    counts = run_checks(spark)
    print("observability loop complete:", counts)
    spark.stop()
