"""Multimodal plumbing + REST source adapter tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    attach_media,
    extract_features,
    sample_frames,
)
from data_engineering_datawarehousingandetlpipeline_spark.sources.rest import (
    extract_fields,
    fetch_observations,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(1, "alpha payload"), (2, "beta payload"), (3, "")],
        schema="doc_id long, text string",
    )
    return attach_media(docs, payload_col="text", id_col="doc_id", media_type="image", fmt="raw")


def test_attach_media_schema_and_sizes(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    assert (
        media.schema["meta"].dataType.simpleString() == MEDIA_META_SCHEMA.simpleString()
    )
    sizes = {r["media_id"]: r["meta"]["size_bytes"] for r in media.collect()}
    assert sizes == {1: 13, 2: 12, 3: 0}


def test_extract_features_stub_is_deterministic(media):
    a = {r["media_id"]: r.asDict() for r in extract_features(media).collect()}
    b = {r["media_id"]: r.asDict() for r in extract_features(media).collect()}
    assert a == b
    feat = a[1]
    assert 64 <= feat["width"] < 256 and 64 <= feat["height"] < 256
    assert len(feat["feature"]) == 8


def test_extract_features_without_stub_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, decode_stub=False).collect()


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_nth=4)
    grouped = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] >= 1 for r in grouped)
    idx = [r["frame_index"] for r in frames.collect()]
    assert all(i % 4 == 0 for i in idx)


def test_rest_extract_fields_candidate_keys():
    row = extract_fields({"fmisid": 101, "name": "X", "lat": "60.1", "t2m": 3.5, "time": "2024-03-01T00:00:00Z"})
    assert row["station_id"] == 101
    assert row["station_name"] == "X"
    assert row["latitude"] == "60.1"
    assert row["temperature"] == 3.5
    assert row["humidity"] is None


def test_rest_retry_recovers_and_reraises():
    from data_engineering_datawarehousingandetlpipeline_spark.sources.rest import with_retries

    calls = {"n": 0}

    def flaky(station_id):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("broker not up yet")
        return {"fmisid": station_id}

    sleeps = []
    fetch = with_retries(flaky, attempts=5, delay_seconds=2.0, sleep=sleeps.append)
    assert fetch("A") == {"fmisid": "A"}
    assert calls["n"] == 3 and sleeps == [2.0, 2.0]

    def always_down(station_id):
        raise ConnectionError("down")

    fetch2 = with_retries(always_down, attempts=2, delay_seconds=0.1, sleep=sleeps.append)
    try:
        fetch2("B")
        raise AssertionError("expected ConnectionError")
    except ConnectionError:
        pass


def test_rest_fetch_with_injected_fetcher(spark):
    payloads = {
        "A": {"fmisid": "A", "time": "2024-03-01T00:00:00Z", "temp": "1.5"},
        "B": None,  # station with no data → skipped
    }
    df = fetch_observations(spark, ["A", "B"], fetcher=payloads.get)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["station_id"] == "A"
    assert rows[0]["temperature"] == 1.5


def test_rest_default_fetcher_raises(spark):
    from data_engineering_datawarehousingandetlpipeline_spark.sources import rest

    with pytest.raises(NotImplementedError):
        rest.fetch_observations(spark, ["A"])


def test_resize_media_rewrites_payload_and_composes(media):
    from data_engineering_datawarehousingandetlpipeline_spark.operators.multimodal import (
        resize_media,
    )

    out = resize_media(media, 224, 224)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "content", "meta",
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    originals = {r["media_id"]: bytes(r["content"] or b"") for r in media.collect()}
    for mid, r in rows.items():
        assert (r["width"], r["height"]) == (224, 224)
        assert bytes(r["content"]) != originals[mid]  # re-encoded bytes
        # meta carried forward with size_bytes refreshed to the new payload
        assert r["meta"]["media_type"] == "image" and r["meta"]["format"] == "raw"
        assert r["meta"]["size_bytes"] == len(bytes(r["content"]))
    # deterministic stub: same inputs, same resized bytes
    again = {r["media_id"]: bytes(r["content"]) for r in resize_media(media, 224, 224).collect()}
    assert again == {m: bytes(r["content"]) for m, r in rows.items()}
    # a different target box re-encodes differently
    other = {r["media_id"]: bytes(r["content"]) for r in resize_media(media, 64, 64).collect()}
    assert all(other[m] != again[m] for m in again)
    # and the output flows straight back into the featurizer (composition)
    feats = extract_features(out).collect()
    assert len(feats) == 3


def test_resize_media_without_stub_raises(media):
    from data_engineering_datawarehousingandetlpipeline_spark.operators.multimodal import (
        resize_media,
    )

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_media(media, 224, 224, decode_stub=False).collect()
