"""CLI entrypoint mirroring the reference's ingestion actions.

``python -m data_engineering_datawarehousingandetlpipeline_spark.cli <action>``
with the reference's three actions (``kafka_stream.py:390-439``):

- ``produce``          — fetch observations (fixture or injected REST) and
                         publish to the staging dir / Kafka topic on an
                         interval (T6).
- ``consume``          — run the streaming ingestion continuously
                         (micro-batch trigger, T1).
- ``bootstrap-hourly`` — drain-everything-now runs on an hourly loop (T5).
                         The reference's version crashes on a never-defined
                         ``args.interval_seconds`` (§2.10.3); here the flag
                         exists and defaults to 3600.
- ``query``            — run any registered query from the engine's surface
                         (``plans/registry.py``) against a parquet dataset
                         dir; print rows or write parquet. ``query --list``
                         enumerates the surface.
- ``maintain``         — the day-2 loop as one command: partition
                         compaction (optionally Z-ordered), retention, and
                         the file-stats analyze for data skipping, all
                         anchored (replayable) and audit-logged.
- ``history``          — the audit surface: version log (DESCRIBE
                         HISTORY analogue) + maintenance trail; ``--as-of
                         N`` reads or exports a point-in-time snapshot,
                         ``--restore N`` rolls back zero-copy (committed
                         as a new version), ``--vacuum-keep N`` frees old
                         versions.

Without Kafka jars the transport is a staging directory of JSON files —
the same downstream pipeline either way (streaming/pipeline.py).
"""

from __future__ import annotations

import argparse
import logging
import os
import time
import uuid

from data_engineering_datawarehousingandetlpipeline_spark.config import load_config
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark

log = logging.getLogger(__name__)


def _produce_once(spark, cfg, staging_dir: str) -> int:
    """Fetch the freshest observations and stage them as one JSON batch."""
    from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
        read_observations_json,
    )

    if not cfg.use_sample_data:  # pragma: no cover - needs live API
        from data_engineering_datawarehousingandetlpipeline_spark.sources.rest import (
            fetch_observations,
            with_retries,
        )

        df = fetch_observations(spark, list(cfg.station_whitelist))
    else:
        fixture = os.environ.get(
            "SAMPLE_DATA_PATH", "tests/fixtures/sample_observations.json"
        )
        df = read_observations_json(spark, fixture)
    n = df.count()
    # Spark writes a directory; the file-stream source watches flat files —
    # promote the single part file to staging/batch-<id>.json.
    batch_id = uuid.uuid4().hex
    tmp = os.path.join(staging_dir, f".tmp-{batch_id}")
    df.coalesce(1).write.mode("overwrite").json(tmp)
    part = next(
        name for name in os.listdir(tmp)
        if name.startswith("part-") and name.endswith(".json")
    )
    out = os.path.join(staging_dir, f"batch-{batch_id}.json")
    os.replace(os.path.join(tmp, part), out)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    log.info("staged %d observations to %s", n, out)
    return n


def _warehouse(spark, cfg):
    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    return WarehouseTable(spark, cfg.warehouse_root)


def _run_query(args) -> None:
    """``query`` action: run a registered query by name (S8-style serving)."""
    from data_engineering_datawarehousingandetlpipeline_spark.plans import (
        all_queries,
    )

    specs = all_queries()
    if args.list or not args.name:
        for name in sorted(specs):
            print(f"{name:28s} {specs[name].description}")
        return
    if args.name not in specs:
        raise SystemExit(
            f"unknown query {args.name!r}; `query --list` shows the surface"
        )
    spark = get_spark(app_name=f"dwh-query-{args.name}")
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.output:
        df.write.mode("overwrite").parquet(args.output)
        log.info("wrote %s to %s", args.name, args.output)
    else:
        df.show(args.limit, truncate=False)


def _run_maintain(args) -> None:
    """``maintain`` action: the day-2 loop as one command — partition
    compaction (optionally Z-ordered), retention, and the file-stats
    analyze for data skipping. Each step is replayable (explicit
    ``--anchor``, never wall clock) and logged to the maintenance audit;
    running twice is a no-op for compaction/retention and an idempotent
    overwrite for the stats manifest."""
    import datetime

    cfg = load_config()
    spark = get_spark(app_name="dwh-maintain")
    warehouse = _warehouse(spark, cfg)
    if not warehouse.exists():
        raise SystemExit(f"no table at {cfg.warehouse_root}")
    anchor = (
        datetime.date.fromisoformat(args.anchor) if args.anchor else None
    )
    if anchor is None:
        raise SystemExit("--anchor YYYY-MM-DD is required (replayable runs)")
    zorder = args.zorder.split(",") if args.zorder else None
    n = warehouse.compact_partitions(
        target_file_rows=args.target_file_rows, before=anchor, zorder=zorder
    )
    log.info("compacted %d partitions", n)
    if args.keep_days:
        dropped = warehouse.expire_partitions(args.keep_days, anchor)
        log.info("retention dropped %d partitions", dropped)
    if args.analyze:
        from data_engineering_datawarehousingandetlpipeline_spark.warehouse.skipping import (
            analyze_file_stats,
        )

        profiled = analyze_file_stats(warehouse, args.analyze.split(","))
        log.info("profiled %d files for skipping", profiled)
    warehouse.maintenance_log().orderBy("run_id").show(50, truncate=False)


def _run_history(args) -> None:
    """``history`` action: the lakehouse audit surface in one command —
    version log (Delta ``DESCRIBE HISTORY``), maintenance audit trail,
    optional point-in-time export (``--as-of N --output dir``: the
    RESTORE-to-a-copy shape), and optional ``--vacuum-keep N``."""
    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    cfg = load_config()
    spark = get_spark(app_name="dwh-history")
    warehouse = WarehouseTable(spark, cfg.warehouse_root, track_versions=True)
    if not warehouse.exists():
        raise SystemExit(f"no table at {cfg.warehouse_root}")
    if args.restore is not None:
        n = warehouse.restore(args.restore)
        log.info(
            "restored to version %d (%d data files); committed as a new "
            "version", args.restore, n,
        )
        return
    if args.as_of is not None:
        snapshot = warehouse.read_as_of(args.as_of)
        if args.output:
            snapshot.write.mode("overwrite").parquet(args.output)
            log.info("exported version %d to %s", args.as_of, args.output)
        else:
            snapshot.show(args.limit, truncate=False)
        return
    print("version log:")
    warehouse.versions().orderBy("version").show(50, truncate=False)
    print("maintenance audit:")
    warehouse.maintenance_log().orderBy("run_id").show(50, truncate=False)
    if args.vacuum_keep is not None:
        freed = warehouse.vacuum_versions(keep_last=args.vacuum_keep)
        log.info(
            "vacuum kept last %d versions, freed %d retained files",
            args.vacuum_keep, freed,
        )


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s"
    )
    parser = argparse.ArgumentParser(description="Spark ingestion utilities")
    parser.add_argument(
        "action",
        choices=[
            "produce", "consume", "bootstrap-hourly", "query", "maintain",
            "history",
        ],
    )
    parser.add_argument("name", nargs="?", help="query name (query action)")
    parser.add_argument("--staging-dir", default="./staging")
    parser.add_argument("--produce-interval-seconds", type=int, default=None)
    parser.add_argument(
        "--interval-seconds", type=int, default=3600,
        help="bootstrap-hourly loop interval",
    )
    parser.add_argument(
        "--once", action="store_true", help="run a single iteration and exit"
    )
    parser.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="dataset directory of parquet tables (query action)",
    )
    parser.add_argument(
        "--output", default=None,
        help="query action: write the result as parquet here instead of printing",
    )
    parser.add_argument(
        "--limit", type=int, default=20, help="rows to print (query action)"
    )
    parser.add_argument("--list", action="store_true", help="list query names")
    parser.add_argument(
        "--explain", action="store_true",
        help="query action: print the physical plan instead of rows",
    )
    parser.add_argument(
        "--anchor", default=None,
        help="maintain action: UTC eligibility date (YYYY-MM-DD), required",
    )
    parser.add_argument(
        "--target-file-rows", type=int, default=1_000_000,
        help="maintain action: bin-pack target rows per file",
    )
    parser.add_argument(
        "--zorder", default=None,
        help="maintain action: comma-separated numeric columns to Z-order",
    )
    parser.add_argument(
        "--keep-days", type=int, default=None,
        help="maintain action: retention window (omit = no retention)",
    )
    parser.add_argument(
        "--analyze", default=None,
        help="maintain action: comma-separated columns to profile for skipping",
    )
    parser.add_argument(
        "--as-of", type=int, default=None, dest="as_of",
        help="history action: read the table as of this version",
    )
    parser.add_argument(
        "--vacuum-keep", type=int, default=None, dest="vacuum_keep",
        help="history action: vacuum manifests older than the last N",
    )
    parser.add_argument(
        "--restore", type=int, default=None,
        help="history action: roll the table back to this version "
        "(committed as a NEW version; zero-copy)",
    )
    args = parser.parse_args(argv)

    if args.action == "query":
        _run_query(args)
        return
    if args.action == "maintain":
        _run_maintain(args)
        return
    if args.action == "history":
        _run_history(args)
        return

    cfg = load_config()
    spark = get_spark(app_name=f"dwh-cli-{args.action}")

    if args.action == "produce":
        interval = args.produce_interval_seconds or cfg.produce_interval_seconds
        while True:
            _produce_once(spark, cfg, args.staging_dir)
            if args.once:
                return
            time.sleep(interval)

    from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
        read_json_file_stream,
        run_available,
        start_ingestion,
    )

    warehouse = _warehouse(spark, cfg)
    os.makedirs(args.staging_dir, exist_ok=True)
    source = read_json_file_stream(spark, args.staging_dir)

    if args.action == "consume":
        if args.once:
            # drain whatever is staged and stop deterministically — stopping
            # a just-started continuous query could process zero batches.
            # The telemetry recorder replaces the reference's per-flush
            # LOGGER.info counts (kafka_stream.py:325-333) with the
            # engine's own per-batch metrics.
            from data_engineering_datawarehousingandetlpipeline_spark.streaming.monitor import (
                attach,
                detach,
            )

            rec = attach(spark)
            try:
                drained = run_available(source, warehouse, cfg.checkpoint_dir)
                # zero batches drained → the listener will never fire; an
                # empty --once run must return immediately, not stall the
                # full poll window waiting for an event that can't arrive
                deadline = time.time() + 10
                while (
                    drained
                    and time.time() < deadline
                    and len(rec.rows()) < drained
                ):
                    time.sleep(0.2)
                for r in rec.rows():
                    log.info(
                        "batch=%s rows=%s ms=%s state=%s", r[2], r[4], r[6], r[7]
                    )
            finally:
                detach(spark, rec)
            return
        query = start_ingestion(
            source, warehouse, cfg.checkpoint_dir,
            trigger_seconds=cfg.flush_interval_seconds,
        )
        query.awaitTermination()  # pragma: no cover - runs forever
    else:  # bootstrap-hourly
        while True:
            run_available(source, warehouse, cfg.checkpoint_dir)
            log.info("hourly drain complete; warehouse rows=%d", warehouse.count())
            if args.once:
                return
            time.sleep(args.interval_seconds)  # pragma: no cover


if __name__ == "__main__":
    main()
