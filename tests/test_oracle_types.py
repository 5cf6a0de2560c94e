"""Output-TYPE parity between every Spark query and its DuckDB oracle.

The value-parity suite (test_oracle_parity.py) coerces integers to float
before comparing, so it can never catch a width divergence — e.g. a bare
final-SELECT ``SUM()`` in DuckDB returns HUGEINT (int128) where Spark
returns BIGINT, and an oracle ``ROW_NUMBER()`` returns BIGINT where the
Spark side casts to INT. A type-sensitive driver schema compare would
flag those as mismatches even with identical values. This gate pins the
exact width mapping for every column of every query pair, schema-only
(no query executes): Spark's analysis provides the DataFrame schema and
DuckDB's relation preparation provides the result types.

Streaming queries are excluded — their CONSTRUCTION runs the staged
end-to-end drain (tempdir shards + availableNow), which is the parity
suite's job; their output schemas are pinned by the explicit DDL strings
in streaming/stateful.py and streaming/pipeline.py.
"""

from __future__ import annotations

import pytest

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from tests.conftest import SF_DIR

SPECS = all_queries()

#: spark simpleString → DuckDB type names that round-trip as the same
#: width through the driver's comparison.
TYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "timestamp": {"TIMESTAMP"},
    "date": {"DATE"},
}

NAMES = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None and not n.startswith("streaming_")
)


@pytest.mark.parametrize("name", NAMES)
def test_query_and_oracle_agree_on_output_types(spark, oracle, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR)
    stypes = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
    rel = oracle.sql(spec.oracle)
    otypes = dict(
        zip([c.lower() for c in rel.columns], [str(t) for t in rel.types])
    )
    assert set(stypes) == set(otypes)
    for col, st in stypes.items():
        allowed = TYPE_MAP.get(st)
        if allowed is None:
            continue  # decimals/arrays: width checked by value parity
        assert otypes[col] in allowed, (
            f"{name}.{col}: spark={st} duckdb={otypes[col]} — cast the "
            "oracle (or the Spark side) so both engines emit one width"
        )
