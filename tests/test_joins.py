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


def test_as_of_join_null_right_value_taken_atomically(spark):
    """A NULL value column in the matched right row must come through as
    NULL — carrying columns independently would resurrect the older row's
    non-NULL value and mix fields from different right rows."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(0), 1.0, "old"),
         (10, _ts(4), None, "new")],  # the matched row: value is NULL
        "user_id long, ts timestamp, value double, tag string",
    )
    [row] = as_of_join(
        left, right, on="user_id", ts_col="ts",
        right_value_cols={"ts": "r_ts", "value": "r_value", "tag": "r_tag"},
    ).collect()
    assert row["r_ts"] == _ts(4) and row["r_tag"] == "new"
    assert row["r_value"] is None  # NOT 1.0 from the older row


def test_as_of_join_tiebreak_cols_pick_latest_version(spark):
    """Among several right rows at ONE timestamp, ``tiebreak_cols`` decides
    the winner — version-first for SCD2 callers, so a same-instant version
    tie resolves to the latest version, not the largest state string."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        # 'zzz' > 'aaa' lexicographically but version 2 is the later one:
        # the default (value-struct) tiebreak would pick 'zzz'.
        [(10, _ts(5), "zzz", 1), (10, _ts(5), "aaa", 2)],
        "user_id long, ts timestamp, state string, version int",
    )
    kwargs = dict(
        on="user_id", ts_col="ts",
        right_value_cols={"state": "state_at", "version": "state_version"},
    )
    [default_row] = as_of_join(left, right, **kwargs).collect()
    assert default_row["state_at"] == "zzz"  # documented default
    [row] = as_of_join(left, right, tiebreak_cols=("version",), **kwargs).collect()
    assert row["state_at"] == "aaa" and row["state_version"] == 2


def test_as_of_join_matches_naive_on_random_data(spark):
    """Randomized equivalence vs a per-row reference implementation.

    Coarse 30 s timestamp grid over few keys deliberately produces equal
    timestamps and empty-key cases — the semantics corners.
    """
    import random

    rng = random.Random(42)
    left = [
        (i, rng.randrange(4), _ts(rng.randrange(0, 30), rng.randrange(2) * 30))
        for i in range(60)
    ]
    right = [
        (rng.randrange(5), _ts(rng.randrange(0, 30), rng.randrange(2) * 30), float(j))
        for j in range(40)
    ]

    def naive(eid, key, ts):
        prior = [(t, v) for (k, t, v) in right if k == key and t <= ts]
        return max(prior)[1] if prior else None

    out = as_of_join(
        spark.createDataFrame(left, "event_id long, user_id long, ts timestamp"),
        spark.createDataFrame(right, "user_id long, ts timestamp, value double"),
        on="user_id", ts_col="ts", right_value_cols={"value": "r_value"},
    ).collect()
    assert len(out) == len(left)
    for r in out:
        expected = naive(r["event_id"], r["user_id"], r["ts"])
        assert r["r_value"] == expected, (r, expected)


def test_band_join_matches_naive_on_random_data(spark):
    import random

    rng = random.Random(7)
    points = [(i, rng.randrange(4), _ts(rng.randrange(0, 50))) for i in range(50)]
    others = [(100 + j, rng.randrange(5), _ts(rng.randrange(0, 50))) for j in range(50)]
    band = 300  # 5 min — exactly the grid step, so boundaries occur

    out = band_join(
        spark.createDataFrame(points, "event_id long, user_id long, ts timestamp"),
        spark.createDataFrame(others, "oid long, user_id long, ts timestamp"),
        on="user_id", ts_col="ts", band_seconds=band,
        other_cols={"oid": "match_id"},
    ).collect()

    got = {}
    for r in out:
        got.setdefault(r["event_id"], set())
        if r["match_id"] is not None:
            got[r["event_id"]].add(r["match_id"])
    for (eid, key, ts) in points:
        expected = {
            oid for (oid, k, t) in others
            if k == key and abs((t - ts).total_seconds()) <= band
        }
        assert got[eid] == expected, (eid, got[eid], expected)


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
