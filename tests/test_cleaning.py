"""Port of the reference's unit-test suite to the Spark engine.

Mirrors ``tests/test_transformations.py`` in the reference (SURVEY.md §5),
including the two tests that encode *intended* (documented) semantics the
reference code misses: hour-flooring before keep-last dedup (§2.10.1) and
the extra-input-column drop (§2.10.2 — ``elevation`` must be projected
away, not kept).

Fixture: ``tests/fixtures/sample_observations.json`` — 6 clean-ish rows
with deliberate dirt (string numerics, unparseable wind_speed, naive
timestamp, NULL humidity, extra ``elevation`` column).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators.cleaning import (
    dedup_keep_first,
    drop_missing_required,
    floor_hour,
    prepare_hourly,
)
from data_engineering_datawarehousingandetlpipeline_spark.operators.quality import (
    long_term_tables,
    missingness_profile,
    validate_split,
    zscore_outliers,
)
from data_engineering_datawarehousingandetlpipeline_spark.schema import (
    OBSERVATION_SCHEMA,
    apply_schema,
)
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    read_observations_json,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample_observations.json")


@pytest.fixture(scope="module")
def sample(spark):
    return read_observations_json(spark, FIXTURE).cache()


def test_fixture_loads_and_coerces(sample):
    collected = sample.collect()
    assert len(collected) == 6
    rows = {(r["station_id"], r["timestamp"].minute): r for r in collected}
    # string numerics coerced; unparseable becomes NULL (pandas "coerce")
    assert rows[("100003", 10)]["temperature"] == 0.5
    assert rows[("100003", 10)]["wind_speed"] is None
    # naive timestamp read as UTC (session tz pinned)
    assert rows[("100004", 20)]["timestamp"].hour == 1


def test_deduplication_removes_duplicates(spark, sample):
    duplicated = sample.union(sample.limit(1))
    assert duplicated.count() == 7
    deduped = dedup_keep_first(duplicated)
    assert deduped.count() == 6


def test_missing_detection(sample):
    profile = {
        r["column_name"]: r["missing_count"]
        for r in missingness_profile(sample).collect()
    }
    assert profile["humidity"] == 1  # NULL humidity at station 100004
    assert profile["wind_speed"] == 1  # unparseable → NULL
    assert profile["station_id"] == 0


def test_outlier_detection_flags_extreme_values(spark, sample):
    spike = spark.createDataFrame(
        [("999999", "Spike", 0.0, 0.0, "2024-03-01T03:00:00Z", "1000.0", "50", "1.0")],
        schema="station_id string, station_name string, latitude string, longitude string, timestamp string, temperature string, humidity string, wind_speed string",
    )
    with_spike = sample.union(apply_schema(spike, OBSERVATION_SCHEMA))
    flagged = zscore_outliers(with_spike, z_threshold=2.0)
    ids = [r["station_id"] for r in flagged.collect()]
    assert ids == ["999999"]


def test_long_term_tables(sample):
    subset = long_term_tables(sample, ["100001", "100002"])
    keys = {r["station_id"] for r in subset.collect()}
    assert keys == {"100001", "100002"}
    assert subset.columns == [f.name for f in OBSERVATION_SCHEMA.fields]


def test_apply_schema_orders_casts_and_drops_extras(spark):
    raw = spark.read.option("multiLine", "true").json(FIXTURE)
    assert "elevation" in raw.columns  # present in the input...
    typed = apply_schema(raw, OBSERVATION_SCHEMA)
    # ...dropped by the projection; declared order preserved (P1)
    assert typed.columns == [f.name for f in OBSERVATION_SCHEMA.fields]
    dtypes = dict(typed.dtypes)
    assert dtypes["station_id"] == "string"  # int-ish input → string cast
    assert dtypes["timestamp"] == "timestamp"
    assert dtypes["temperature"] == "double"


def test_prepare_for_bigquery_handles_missing_and_duplicates(spark, sample):
    dirty_extra = spark.createDataFrame(
        [
            (None, "No Station", "2024-03-01T04:00:00Z", "5.0"),  # NULL key → drop
            ("100001", "Helsinki Central", "2024-03-01T00:15:00Z", "1.0"),  # dup key
        ],
        schema="station_id string, station_name string, timestamp string, temperature string",
    )
    dirty = sample.unionByName(
        apply_schema(dirty_extra, OBSERVATION_SCHEMA), allowMissingColumns=False
    )
    cleaned = dedup_keep_first(drop_missing_required(dirty), order_by=None)
    rows = cleaned.collect()
    assert all(r["station_id"] is not None and r["timestamp"] is not None for r in rows)
    keys = [(r["station_id"], r["timestamp"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert len(rows) == 6  # 8 in → 1 NULL-key + 1 duplicate removed


def test_prepare_hourly_floors_and_keeps_latest(sample):
    """The documented-but-missing semantics (§2.10.1): floor to hour, then
    the LATEST record within each (station, hour) wins."""
    hourly = prepare_hourly(sample)
    rows = {(r["station_id"], r["timestamp"].isoformat()): r for r in hourly.collect()}
    # 6 rows → 100001's 00:15 and 00:45 collapse into hour 00:00
    assert len(rows) == 5
    winner = rows[("100001", "2024-03-01T00:00:00")]
    assert winner["temperature"] == 2.0  # 00:45 (latest) wins over 00:15
    # every timestamp is hour-floored
    assert all(ts.endswith(":00:00") for _, ts in rows)


def test_floor_hour_is_date_trunc(sample):
    floored = floor_hour(sample)
    assert all(
        r["timestamp"].minute == 0 and r["timestamp"].second == 0
        for r in floored.collect()
    )


def test_validate_split_quarantines_bad_rows(spark, sample):
    bad = spark.createDataFrame(
        [(None, "Ghost", "2024-03-01T05:00:00Z", "1.0")],
        schema="station_id string, station_name string, timestamp string, temperature string",
    )
    combined = sample.unionByName(
        apply_schema(bad, OBSERVATION_SCHEMA), allowMissingColumns=False
    )
    valid, invalid = validate_split(combined)
    assert valid.count() == 6
    assert invalid.count() == 1
    assert invalid.collect()[0]["station_name"] == "Ghost"


def test_malformed_payloads_become_nulls_then_drop(spark):
    """Dirty-transport contract end to end: a consumer batch mixing valid
    JSON, syntactic garbage, wrong-shape JSON, and empty strings must
    decode PERMISSIVEly (NULL-field rows, no job failure — Spark 4 ANSI
    mode makes silent-throw regressions easy) and required-field cleaning
    must then drop exactly the unusable rows."""
    from pyspark.sql import functions as F

    from data_engineering_datawarehousingandetlpipeline_spark.operators.cleaning import (
        drop_missing_required,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.sources.kafka import (
        decode_json,
    )

    good = (
        '{"station_id": "101", "station_name": "s", "timestamp": '
        '"2024-01-01T00:00:00Z", "temperature": 1.5}'
    )
    payloads = [
        (good,),
        ("{not json at all",),
        ('{"station_id": null, "timestamp": null}',),
        ("",),
        ('[1, 2, 3]',),
    ]
    decoded = decode_json(
        spark.createDataFrame(payloads, "value string")
    )
    assert decoded.count() == len(payloads)  # nothing thrown, nothing lost
    kept = drop_missing_required(decoded)
    rows = kept.collect()
    assert len(rows) == 1 and rows[0]["station_id"] == "101"
