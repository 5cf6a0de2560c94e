"""CLI actions end-to-end (produce → bootstrap-hourly → warehouse)."""

from __future__ import annotations

import os

from data_engineering_datawarehousingandetlpipeline_spark.cli import main

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample_observations.json")


def test_produce_then_bootstrap_hourly(spark, tmp_path, monkeypatch):
    staging = str(tmp_path / "staging")
    monkeypatch.setenv("USE_SAMPLE_DATA", "true")
    monkeypatch.setenv("SAMPLE_DATA_PATH", FIXTURE)
    monkeypatch.setenv("WAREHOUSE_ROOT", str(tmp_path / "warehouse"))
    monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "ckpt"))

    main(["produce", "--staging-dir", staging, "--once"])
    staged = [f for f in os.listdir(staging) if f.startswith("batch-")]
    assert len(staged) == 1 and staged[0].endswith(".json")

    main(["bootstrap-hourly", "--staging-dir", staging, "--once"])
    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    warehouse = WarehouseTable(spark, str(tmp_path / "warehouse"))
    assert warehouse.count() == 5  # fixture cleans to 5 hourly rows

    # drain again with the same checkpoint: no new files → no change
    main(["bootstrap-hourly", "--staging-dir", staging, "--once"])
    assert warehouse.count() == 5


def test_query_action_lists_runs_and_writes(spark, tmp_path, capsys):
    main(["query", "--list"])
    assert "pricing_summary" in capsys.readouterr().out

    main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
          "--limit", "3"])
    assert "l_returnflag" in capsys.readouterr().out

    out = str(tmp_path / "q_out")
    main(["query", "distinct_counts", "--sf-dir", "/root/testdata/sf0.001",
          "--output", out])
    assert spark.read.parquet(out).count() == 1

    main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
          "--explain"])
    assert "HashAggregate" in capsys.readouterr().out


def test_consume_once_drains_staging(spark, tmp_path, monkeypatch):
    """`consume --once` must actually process what is staged (a continuous
    query stopped right after start() could deterministically process
    nothing) — it drains synchronously like the hourly bootstrap."""
    staging = str(tmp_path / "staging")
    monkeypatch.setenv("USE_SAMPLE_DATA", "true")
    monkeypatch.setenv("SAMPLE_DATA_PATH", FIXTURE)
    monkeypatch.setenv("WAREHOUSE_ROOT", str(tmp_path / "warehouse"))
    monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "ckpt"))

    main(["produce", "--staging-dir", staging, "--once"])
    main(["consume", "--staging-dir", staging, "--once"])

    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    warehouse = WarehouseTable(spark, str(tmp_path / "warehouse"))
    assert warehouse.count() == 5


def test_maintain_action_compacts_retains_analyzes(spark, tmp_path, monkeypatch):
    """`maintain` must run the day-2 loop end to end: bin-pack the cold
    partition, drop partitions past retention, build the skipping
    manifest, and leave the whole story in the maintenance audit."""
    staging = str(tmp_path / "staging")
    monkeypatch.setenv("USE_SAMPLE_DATA", "true")
    monkeypatch.setenv("SAMPLE_DATA_PATH", FIXTURE)
    monkeypatch.setenv("WAREHOUSE_ROOT", str(tmp_path / "warehouse"))
    monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    main(["produce", "--staging-dir", staging, "--once"])
    main(["bootstrap-hourly", "--staging-dir", staging, "--once"])

    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    warehouse = WarehouseTable(spark, str(tmp_path / "warehouse"))
    rows = warehouse.count()
    assert rows > 0

    main([
        "maintain", "--anchor", "2024-03-09", "--target-file-rows", "2",
        "--keep-days", "365", "--analyze", "temperature",
    ])
    assert warehouse.count() == rows  # compaction + in-window retention: lossless
    ops = {r.op for r in warehouse.maintenance_log().collect()}
    assert "analyze_stats" in ops
    assert os.path.isdir(str(tmp_path / "warehouse" / "_stats"))

    # replay: same anchor, nothing newly eligible — still lossless
    main(["maintain", "--anchor", "2024-03-09", "--target-file-rows", "2"])
    assert warehouse.count() == rows


def test_history_action_versions_export_and_vacuum(spark, tmp_path, monkeypatch, capsys):
    """`history` prints the version log + audit trail, exports a
    point-in-time snapshot with --as-of/--output, and --vacuum-keep
    frees old versions."""
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    root = str(tmp_path / "warehouse")
    monkeypatch.setenv("WAREHOUSE_ROOT", root)
    wh = WarehouseTable(
        spark, root, keys=["k", "ts"], ts_col="ts", track_versions=True
    )
    df = spark.createDataFrame(
        [(1, "2024-03-01T00:00:00", 1.0), (2, "2024-03-01T01:00:00", 2.0)],
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    wh.append(df, verify=False)                       # v1
    wh.delete_where(F.col("k") == 2)                  # v2

    main(["history"])
    out = capsys.readouterr().out
    assert "version log:" in out and "delete_where" in out

    exported = str(tmp_path / "v1_export")
    main(["history", "--as-of", "1", "--output", exported])
    assert spark.read.parquet(exported).count() == 2  # pre-delete snapshot

    main(["history", "--vacuum-keep", "1"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        WarehouseTable(
            spark, root, keys=["k", "ts"], ts_col="ts", track_versions=True
        ).read_as_of(1)


def test_history_restore_rolls_back(spark, tmp_path, monkeypatch):
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (
        WarehouseTable,
    )

    root = str(tmp_path / "warehouse")
    monkeypatch.setenv("WAREHOUSE_ROOT", root)
    wh = WarehouseTable(
        spark, root, keys=["k", "ts"], ts_col="ts", track_versions=True
    )
    df = spark.createDataFrame(
        [(1, "2024-03-01T00:00:00", 1.0), (2, "2024-03-01T01:00:00", 2.0)],
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    wh.append(df, verify=False)                       # v1
    wh.delete_where(F.col("k") == 2)                  # v2
    assert wh.count() == 1

    main(["history", "--restore", "1"])
    assert wh.count() == 2                            # rollback applied
    ops = {r.version: r.op for r in wh.versions().collect()}
    assert ops[3] == "restore"                        # committed, not rewritten
