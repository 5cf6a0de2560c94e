"""Targeted tests for the round-5 additions: corpus n-gram top-k,
per-group hash reservoir sampling, k-means cluster profiling, the
hash-verifiable sketch contract, and the NULL-text chunk fix.

The registry-driven oracle-parity suite already value-checks each query
end-to-end; these tests pin the CONTRACTS (determinism, bounds, NULL
behavior) that a hash match alone would not explain if it broke.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    similarity as sim,
)
from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    text as tx,
)
from data_engineering_datawarehousingandetlpipeline_spark.plans import (
    extensions as ex,
)
from data_engineering_datawarehousingandetlpipeline_spark.plans.pipeline_queries import (
    q_approx_sketches,
)
from tests.conftest import SF_DIR


def test_ngram_topk_is_descending_and_bounded(spark):
    rows = ex.q_doc_ngram_topk(spark, SF_DIR).collect()
    assert len(rows) == ex.NGRAM_TOPK_K
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        # doc frequency can never exceed total occurrences
        assert 0 < r.n_docs <= r.n_occurrences


def test_group_sample_bounded_and_replay_stable(spark):
    a = ex.q_doc_group_sample(spark, SF_DIR).collect()
    b = ex.q_doc_group_sample(spark, SF_DIR).collect()
    assert a == b  # no RNG anywhere — identical on replay
    per_source: dict[str, int] = {}
    for r in a:
        per_source[r.source] = per_source.get(r.source, 0) + 1
        assert 1 <= r.rk <= ex.GROUP_SAMPLE_PER_SOURCE
    assert all(n <= ex.GROUP_SAMPLE_PER_SOURCE for n in per_source.values())


def test_group_sample_members_stable_under_corpus_growth(spark):
    """Hash ranking means a doc's sample membership can only change when
    a new doc HASHES below it within its source — growing the corpus
    never reshuffles the ranking of existing members (the property an
    RNG reservoir loses). Simulated by sampling a filtered half-corpus:
    every kept doc of the half-corpus that stays in the full corpus's
    top-n must keep its relative order."""
    full = {
        (r.source, r.doc_id): r.rk
        for r in ex.q_doc_group_sample(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") % 2 == 0
    )
    from pyspark.sql import Window

    from data_engineering_datawarehousingandetlpipeline_spark.functions.hashing import (
        u32_hash,
    )

    h = u32_hash(F.concat(F.lit("gsample:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(F.col("u32"), F.col("doc_id"))
    half = (
        docs.select("source", "doc_id", h.alias("u32"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ex.GROUP_SAMPLE_PER_SOURCE)
        .collect()
    )
    for r in half:
        if (r.source, r.doc_id) in full:
            # present in both samples → rank in the half-corpus can only
            # be tighter (fewer competitors), never looser
            assert r.rk <= full[(r.source, r.doc_id)]


def test_cluster_profile_occupancy_sums_to_corpus(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    prof = sim.cluster_profile(embs, n_centroids=8, iterations=1).collect()
    assert len(prof) == 8
    assert sum(r.n_vecs for r in prof) == embs.count()
    for r in prof:
        if r.n_vecs:
            # radius is the worst member, so it bounds the mean
            assert r.min_cos <= r.avg_cos <= 1.0
        else:
            assert r.avg_cos is None and r.min_cos is None


def test_cluster_profile_empty_cluster_row(spark):
    """Two far-apart groups + a third seed that captures nothing must
    still emit a row (n_vecs = 0, NULL stats) — silent omission would
    hide exactly the index waste the diagnostic exists to catch."""
    rows = [(i, [1.0, 0.0]) for i in range(3)] + [(10 + i, [0.0, 1.0]) for i in range(3)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    prof = {
        r.cid: r.n_vecs
        for r in sim.cluster_profile(embs, n_centroids=3, iterations=1).collect()
    }
    assert set(prof) == {0, 1, 2}
    assert sum(prof.values()) == 6
    assert 0 in prof.values()


def test_sketch_contract_bools_hold(spark):
    """Every within-tolerance boolean must be TRUE on the test corpus —
    this is exactly the property that makes the query hash-match its
    TRUE-literal oracle."""
    rows = q_approx_sketches(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.hll_within_5pct is True
        assert r.p50_rank_ok is True
        assert r.p90_rank_ok is True
        assert r.p99_rank_ok is True


def test_streaming_chunks_restart_idempotent(spark, tmp_path):
    """The exactly-once parquet sink + checkpoint must make the chunk
    stream restartable: a second drain over the same checkpoint emits
    nothing new, and newly landed files emit ONLY their own chunks."""
    import json

    from pyspark.sql import types as T

    from data_engineering_datawarehousingandetlpipeline_spark.streaming.pipeline import (
        start_chunking,
    )

    indir = tmp_path / "incoming"
    indir.mkdir()
    (indir / "a.json").write_text(
        json.dumps({"doc_id": "1", "text": "a b c d e"}) + "\n"
        + json.dumps({"doc_id": "2", "text": None}) + "\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    out, ckpt = str(tmp_path / "chunks"), str(tmp_path / "ckpt")

    def drain():
        q = start_chunking(
            spark.readStream.schema(schema).json(str(indir)),
            out, ckpt, chunk_size=2, stride=2, available_now=True,
        )
        q.awaitTermination()
        return sorted(
            (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
            for r in spark.read.parquet(out).collect()
        )

    first = drain()
    assert first == [
        (1, 0, 2, "a b"), (1, 1, 2, "c d"), (1, 2, 1, "e"),
        (2, 0, 0, ""),  # NULL text → one empty chunk, streamed too
    ]
    assert drain() == first  # replay with nothing new: no duplicates
    (indir / "b.json").write_text(
        json.dumps({"doc_id": "3", "text": "x y"}) + "\n"
    )
    assert drain() == first + [(3, 0, 2, "x y")]  # only the new file's chunks


def test_chunk_documents_null_text_yields_one_empty_chunk(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    )
    out = tx.chunk_documents(df, chunk_size=2, stride=2).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.n_chunk_tokens, r.chunk_text))
    assert by_doc[1] == [(0, "")]  # NULL text → one empty chunk, not dropped
    assert by_doc[2] == [(2, "a b"), (1, "c")]
