"""Declarative data contracts: dbt-test / Delta-constraint checks, one scan.

A table's contract is a list of named violation predicates (``not_null``,
``accepted_range``, ``accepted_values``, ``unique_key``); evaluating it
must not cost one scan per check the way naive ``SELECT COUNT(*) WHERE
NOT <check>`` loops do. :func:`check_contract` folds every row-level
check into ONE conditional-aggregate pass (map-side partial aggregation,
a single 1-row result widened back to per-check rows with a zero-cost
``stack`` unpivot — the ``lineitem_profile`` shape), and key uniqueness
rides the same pass as ``COUNT(*) − COUNT(DISTINCT keys)``. Referential
checks need the other table by definition; they join as a broadcast/AQE
left-anti and union one row in.

Violations are COUNTED, not sampled — the contract row says how broken a
feed is, and the predicate itself is a Column the caller can reuse to
quarantine the offending rows (operators/quality.validate_split).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null_{col}", F.col(col).isNull()


def accepted_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"range_{col}",
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def accepted_values(col: str, values: Sequence) -> tuple[str, Column]:
    return (
        f"values_{col}",
        F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    )


def check_contract(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]],
    unique_key: Sequence[str] | None = None,
) -> DataFrame:
    """Evaluate row-level checks (name → violation predicate) in one pass.

    Returns ``(check, n_violations bigint, passed boolean)`` — one row
    per check, plus a ``unique_<keys>`` row when ``unique_key`` is given
    (violations = duplicate-row count beyond the first of each key).
    """
    # coalesce: SUM over ZERO rows is NULL — an empty feed (e.g. an empty
    # streaming micro-batch) must report 0 violations / passed, not NULLs
    aggs = [
        F.coalesce(F.sum((cond).cast("bigint")), F.lit(0)).alias(name)
        for name, cond in checks
    ]
    names = [name for name, _ in checks]
    if unique_key:
        uname = "unique_" + "_".join(unique_key)
        aggs.append(
            (
                F.count("*")
                - F.count_distinct(*[F.col(k) for k in unique_key])
            ).alias(uname)
        )
        names.append(uname)
    one_row = df.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return one_row.selectExpr(
        f"stack({len(names)}, {stack}) as (check, n_violations)"
    ).select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Orphan count: child keys with no parent — one left-anti join row,
    schema-compatible with :func:`check_contract` output for a union."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.lit(name or f"ref_{child_key}").alias("check"),
        F.count("*").alias("n_violations"),
        (F.count("*") == 0).alias("passed"),
    )
