"""as-of / banded range join edge semantics (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

from data_engineering_datawarehousingandetlpipeline_spark.operators.joins import (
    as_of_join,
    band_join,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 3, 1, 10, minute, second)


def test_as_of_join_ties_match_and_missing_stay_null(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 10, _ts(5)), (3, 20, _ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(0), 1.0),   # same instant as left #1 → must match (<=)
         (10, _ts(4), 2.0),
         (10, _ts(6), 9.0)],  # after left #2 → never matches
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in as_of_join(
            left, right, on="user_id", ts_col="ts",
            right_value_cols={"ts": "r_ts", "value": "r_value"},
        ).collect()
    }
    assert out[1]["r_value"] == 1.0 and out[1]["r_ts"] == _ts(0)
    assert out[2]["r_value"] == 2.0  # latest at-or-before 10:05
    assert out[3]["r_value"] is None and out[3]["r_ts"] is None  # no right rows


def test_band_join_inclusive_bounds_and_unmatched(spark):
    points = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 99, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    others = spark.createDataFrame(
        [(100, 10, _ts(5)),        # exactly −band → inclusive
         (101, 10, _ts(15)),       # exactly +band → inclusive
         (102, 10, _ts(15, 1)),    # 1 s beyond → excluded
         (103, 10, _ts(11))],      # inside
        "oid long, user_id long, ts timestamp",
    )
    out = band_join(
        points, others, on="user_id", ts_col="ts",
        band_seconds=300, other_cols={"oid": "match_id"},
    ).collect()
    matches = sorted(r["match_id"] for r in out if r["event_id"] == 1)
    assert matches == [100, 101, 103]
    unmatched = [r for r in out if r["event_id"] == 2]
    assert len(unmatched) == 1 and unmatched[0]["match_id"] is None
