"""Multimodal lifecycle: attach → resize → featurize → frame-sample.

The training-data path for opaque media payloads (the reference pipeline
stops at tabular observations; this is the §2.11 extension surface):
binary content rides a typed metadata struct, every Python-touching step
is an Arrow-batched ``mapInPandas`` stage, and the codec site is a
deterministic stub (this container carries no image/audio libraries —
``decode_stub=False`` raises at the exact line a libjpeg/ffmpeg build
plugs into).

What the self-assertions pin:

1. resize REWRITES payloads (every output byte string differs from its
   input) while metadata carries forward with ``size_bytes`` refreshed;
2. the resized payload flows straight back into the featurizer — the
   ``media_pipeline`` registry query's chain — and the features are a
   pure function of the resized bytes (replays agree);
3. frame sampling explodes JVM-side off the stub-decoded frame count:
   every doc yields ceil(n_frames / 4) rows.

Run: python examples/media_pipeline.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    multimodal as mm,
)
from data_engineering_datawarehousingandetlpipeline_spark.session import get_spark
from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="media-pipeline-demo")
    docs = load_table(spark, sf_dir, "documents").limit(200)

    media = mm.attach_media(
        docs, payload_col="text", id_col="doc_id", media_type="image", fmt="txt"
    )
    n = media.count()
    originals = {
        r["media_id"]: bytes(r["content"] or b"") for r in media.collect()
    }
    print(f"attached {n} media payloads (text bytes standing in for pixels)")

    # -- resize: payload rewrite + JVM-side metadata carry-forward --------
    resized = mm.resize_media(media, 224, 224)
    rows = resized.collect()
    assert len(rows) == n
    for r in rows:
        assert bytes(r["content"]) != originals[r["media_id"]]
        assert r["meta"]["size_bytes"] == len(bytes(r["content"]))
        assert (r["width"], r["height"]) == (224, 224)
    print("resize: every payload rewritten, size_bytes refreshed in meta")

    # -- featurize the RESIZED bytes (the media_pipeline registry chain) --
    feats = mm.extract_features(resized)
    first = {r["media_id"]: r["feature"] for r in feats.collect()}
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(
        mm.resize_media(media, 224, 224)
    ).collect()}
    assert first == again, "stub decode must be a pure function of payload"
    print(f"featurize: {len(first)} deterministic 8-dim vectors from resized bytes")

    # -- frame sampling: JVM-side explode off the decoded frame count -----
    frame_counts = {
        r["media_id"]: r["n_frames"]
        for r in mm.extract_features(media).collect()
    }
    sampled = (
        mm.sample_frames(media, every_nth=4)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_sampled"))
        .collect()
    )
    assert len(sampled) == n
    for r in sampled:
        assert r["n_sampled"] == math.ceil(frame_counts[r["media_id"]] / 4)
    print("frame-sample: every doc yields ceil(n_frames / 4) rows")

    # -- the loud codec swap point ----------------------------------------
    try:
        mm.extract_features(media, decode_stub=False).collect()
    except Exception as exc:  # Py4J wraps the executor-side error
        assert "codec" in str(exc) or "NotImplementedError" in str(exc)
        print("real-codec path raises loudly (documented swap point): OK")
    else:
        raise AssertionError("decode_stub=False must raise in this container")

    print("media pipeline lifecycle complete")


if __name__ == "__main__":
    main()
