"""Engine-portable hashing primitives.

The cross-engine contract this repo's oracle parity rests on: the 32-bit
value of the first 8 hex chars of ``md5(x)``, as a BIGINT. Spark and
DuckDB reproduce it bit-for-bit, which is what makes MinHash signatures,
k-means training samples, and deterministic Bernoulli sampling
hash-comparable across engines. Every site MUST use these helpers —
hand-rolled copies can drift independently and silently break one
query's parity while the others keep passing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def u32_hash(col: Column) -> Column:
    """First 32 bits of md5(col) as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def sql_u32_hash(expr: str) -> str:
    """Oracle-side twin of :func:`u32_hash` (DuckDB SQL text)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
