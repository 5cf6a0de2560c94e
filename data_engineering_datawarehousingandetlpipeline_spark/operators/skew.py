"""Skew-resistant aggregation: deterministic salting + two-stage combine.

At 100 TB a groupBy on a low-cardinality or Zipf-distributed key (event
types, hot stations) concentrates whole partitions on a few reducers. AQE's
skew handling covers joins; for aggregations the classic fix is salting:

    stage 1: groupBy(key, salt) — partial aggregates spread over N buckets
    stage 2: groupBy(key)       — combine the N partials

Salt must be deterministic (no ``rand()`` — retries/speculative tasks would
double-count): here it hashes a high-cardinality companion column with
``xxhash64``. Only algebraic aggregates (count/sum/min/max) are exposed —
they re-combine losslessly; decimal sums keep the engine's exactness
contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINE = {
    "count": F.sum,       # counts re-combine by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "count": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small.

    The manual fix for a hot join key when AQE's skew splitting cannot
    apply (it only rewrites sort-merge joins whose partitions it is free
    to re-plan — pinned distributions, streaming micro-batches, and
    non-SMJ shapes fall outside it) and the small side is too big or too
    hot to broadcast outright. The big side gains a deterministic salt
    (``pmod(xxhash64(salt_col), buckets)`` — no ``rand()``: retried and
    speculative tasks must re-derive the SAME salt or rows migrate
    between buckets mid-query); the small side is replicated once per
    bucket, and the join runs on ``on + [salt]`` so each hot key's rows
    spread over ``buckets`` reducers instead of pinning one.

    Semantically identical to ``big.join(small, on, how)`` for inner and
    left joins: every big row carries exactly one salt value, matching
    exactly one replica of its small-side row. Replication multiplies
    the small side ``buckets``× — the knob trades reducer balance
    against build size, and both sides of that trade are linear.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column | str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation over ``(keys, salt)`` then ``keys``.

    ``aggs`` maps output alias → (column, fn) with fn in
    {count, sum, min, max}. ``salt_col`` should be high-cardinality
    (an id / timestamp); the salt is ``pmod(xxhash64(salt_col), buckets)``.
    """
    for _, (_, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _PARTIAL[fn](F.col(c) if isinstance(c, str) else c).alias(f"__p_{alias}")
            for alias, (c, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[fn](F.col(f"__p_{alias}")).alias(alias)
            for alias, (_, fn) in aggs.items()
        ]
    )
