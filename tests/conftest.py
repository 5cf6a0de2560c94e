"""Shared Spark session + oracle-comparison helpers for the test suite."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

#: r17 fast/slow split: nodeids listed in slow_manifest.txt (recorded
#: call time >= 3 s in a full --durations=0 run) are auto-marked `slow`;
#: pytest.ini's `addopts = -m "not slow"` deselects them so the default
#: tier — the one the round driver runs — finishes in ~7 min instead of
#: ~32. Run everything with `python -m pytest tests/ -m ''`.
_SLOW_MANIFEST = Path(__file__).parent / "slow_manifest.txt"


def pytest_collection_modifyitems(config, items):
    if not _SLOW_MANIFEST.exists():
        return
    slow_ids = {
        line.split("#")[0].strip()
        for line in _SLOW_MANIFEST.read_text().splitlines()
        if line.strip() and not line.lstrip().startswith("#")
    }
    for item in items:
        # nodeid is rootdir-relative (tests/<file>::<name>[param])
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)

from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    TABLE_NAMES,
)

SF_DIR = "/root/testdata/sf0.001"
SF_CORRECTNESS_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="dwh-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the corpus registered as views (driver-style)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def normalize(rows: list[tuple]) -> list[tuple]:
    """Order-insensitive, type-normalized row set for cross-engine compare."""

    def norm_value(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**52 else v
        if hasattr(v, "isoformat"):
            return v.isoformat().replace("+00:00", "")
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
        return v

    return sorted(
        (tuple(norm_value(v) for v in row) for row in rows),
        key=lambda r: tuple(str(x) for x in r),
    )


def assert_matches_oracle(spark, con, fn, sql, sf_dir=SF_DIR):
    """Run the Spark plan and the DuckDB oracle; compare row sets exactly."""
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracle_rows = [tuple(r) for r in con.execute(sql).fetchall()]
    spark_cols = [c.lower() for c in sdf.columns]
    oracle_cols = [d[0].lower() for d in con.execute(sql).description]
    assert spark_cols == oracle_cols, f"column mismatch: {spark_cols} vs {oracle_cols}"
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    ns, no = normalize(spark_rows), normalize(oracle_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(ns, no)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
