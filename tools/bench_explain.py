"""Dump .explain('formatted') for bench-tier queries to plans/<round>/.

Usage: python tools/bench_explain.py <suffix> [name ...]
Writes plans/$PLANS_ROUND/<query>_<suffix>.txt (PLANS_ROUND defaults to
r17) for every bench-flagged query plus the TPC-H tier (union of the two
bench.py tiers), or only the names given.
SPARK_GRAFT_SF_DIR overrides the table dir (default sf0.1 — the bench tier).
"""
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from data_engineering_datawarehousingandetlpipeline_spark.plans.registry import (
    TPCH_SHAPES,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r17")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dwh-bench-explain")
    specs = all_queries()
    if not names:
        names = sorted(
            {n for n, s in specs.items() if s.bench} | set(TPCH_SHAPES)
        )
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(name, "->", f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
