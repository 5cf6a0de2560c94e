"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The 100 TB training-data story (BASELINE.json north star): image/audio/
video ride along as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas transforms over ``mapInPandas`` so the heavy bytes never leave the
executor and Python sees whole record batches, not rows.

The container has no image/audio libraries, so the *codec* step is
deliberately stubbed: ``decode_stub=True`` derives deterministic fake
features from the payload bytes (sha-seeded), while ``decode_stub=False``
raises ``NotImplementedError`` where a real libjpeg/librosa call would go.
Everything Spark-side — schema, batch iteration, partition behavior,
column pruning of the binary payload — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_datawarehousingandetlpipeline_spark.session import spread

#: metadata struct carried next to every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("format", T.StringType(), True),       # jpeg|wav|mp4|...
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_media(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    media_type: str = "image",
    fmt: str = "bin",
) -> DataFrame:
    """Wrap an existing binary/string column into the media schema.

    ``size_bytes`` is computed JVM-side (``octet_length``); the payload is
    casted, never copied through Python.
    """
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(content).cast("long").alias("size_bytes"),
            F.lit(None).cast("string").alias("source_uri"),
        ).alias("meta"),
    )


def _stub_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decoder: dimensions + an 8-dim feature from sha256.

    Stands in for libjpeg/ffmpeg, which this container does not carry; the
    derivation is pure so tests and oracle-style replays are stable.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 + digest[2] % 16
    feature = [round(b / 255.0, 6) for b in digest[3:11]]
    return width, height, n_frames, feature


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize each payload via Arrow-batched ``mapInPandas``.

    Batch shape: the iterator yields whole Arrow record batches; only
    ``media_id`` and ``content`` are read (column pruning drops ``meta``
    before Python). With ``decode_stub=False`` this is where a real codec
    plugs in.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs are not available in this image; "
                    "run with decode_stub=True or provide a codec build"
                )
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                width, height, n_frames, feature = _stub_decode(bytes(payload or b""))
                rows.append((media_id, width, height, n_frames, feature))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_frames", "feature"]
            )

    return spread(df.select("media_id", "content")).mapInPandas(
        featurize, _FEATURE_SCHEMA
    )


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing: payload → decoded → scaled → re-encoded payload.

    Output keeps the media schema (plus the new ``width``/``height``) so
    resized media flows straight back into :func:`extract_features` /
    :func:`sample_frames` — the resize → featurize composition a training
    pipeline runs. The payload column passes THROUGH Python here by
    necessity (a real resize rewrites the bytes); ``meta`` is rebuilt
    JVM-side after the transform with the new ``size_bytes``, and the
    stub re-encode is deterministic: the ASCII sha256 hex digest of
    payload ‖ target box (so replays and tests are stable, the output
    payload differs from the input exactly when the bytes would, and —
    being valid UTF-8 — downstream oracle engines whose hash functions
    are string-only can reproduce the chain byte-for-byte). With
    ``decode_stub=False`` the loop body is where libjpeg/ffmpeg
    scale-and-encode plugs in.

    Precondition: ``media_id`` is unique per input row (the media schema's
    contract). The metadata carry-forward join re-asserts it defensively
    with a ``dropDuplicates`` on the meta projection, so a malformed input
    with repeated ids degrades to one arbitrary-but-deterministic meta row
    per id instead of fanning the join out quadratically.
    """

    def rescale(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs are not available in this image; "
                    "run with decode_stub=True or provide a codec build"
                )
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                src = bytes(payload or b"")
                resized = hashlib.sha256(
                    src + f"|{target_width}x{target_height}".encode()
                ).hexdigest().encode()
                rows.append(
                    (media_id, target_width, target_height, resized)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    resized = spread(df.select("media_id", "content")).mapInPandas(
        rescale,
        T.StructType(_RESIZED_SCHEMA.fields[:-1]),  # meta rebuilt below
    )
    # carry the original metadata forward JVM-side (media_id equi-join on
    # the pruned 2-column projection; payload bytes never join twice) and
    # refresh size_bytes for the re-encoded content. dropDuplicates
    # enforces the media_id-uniqueness precondition at the join boundary.
    orig_meta = df.select("media_id", F.col("meta").alias("__m")).dropDuplicates(
        ["media_id"]
    )
    return (
        resized.join(orig_meta, "media_id")
        .select(
            "media_id",
            "width",
            "height",
            "content",
            F.struct(
                F.col("__m.media_type").alias("media_type"),
                F.col("__m.format").alias("format"),
                F.octet_length("content").cast("long").alias("size_bytes"),
                F.col("__m.source_uri").alias("source_uri"),
            ).alias("meta"),
        )
    )


def sample_frames(
    df: DataFrame, every_nth: int = 4, decode_stub: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    The frame *count* comes from the (stubbed) decode; the explode happens
    JVM-side so a real decoder only adds the per-frame byte extraction.
    """
    feats = extract_features(df, decode_stub=decode_stub)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_index"),
    )
