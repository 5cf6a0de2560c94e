"""Every registered query must match its DuckDB oracle exactly at sf0.001.

This mirrors the driver's t2 correctness gate (row count + schema + value
comparison, order-insensitive) so regressions surface locally before a
round ends.
"""

from __future__ import annotations

import pytest

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from tests.conftest import assert_matches_oracle

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, oracle, name):
    spec = SPECS[name]
    if spec.oracle is None:
        df = spec.fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    assert_matches_oracle(spark, oracle, spec.fn, spec.oracle)
