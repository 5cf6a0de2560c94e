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
