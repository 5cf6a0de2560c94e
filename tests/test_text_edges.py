"""Text-operator behavior on degenerate inputs (empty / NULL / whitespace).

The corpus never contains these, but a reference user's data will; the
contract: no ANSI arithmetic errors, NULL quality for unscorable text,
'und' language, and a stable fallback fingerprint. Division-by-zero
yields NULL in both engines (Spark try_divide ≙ DuckDB `/`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators import text as tx


def test_text_operators_tolerate_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, None), (4, "  spaced   out  ")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            tx.token_count(F.col("text")).alias("n_tok"),
            tx.word_shingles(F.col("text"), 3).alias("shingles"),
            F.round(tx.quality_score(F.col("text")), 4).alias("q"),
            tx.fingerprint(F.col("text")).alias("fp"),
            tx.predicted_lang(F.col("text")).alias("lang"),
        ).collect()
    }
    # empty text: the split quirk yields one empty token; quality is NULL
    # (0-length division), not an ANSI error
    assert rows[1]["n_tok"] == 1 and rows[1]["q"] is None
    assert rows[1]["lang"] == "und"
    # NULL text: NULL token count, NULL quality, fallback fingerprint
    assert rows[3]["n_tok"] is None and rows[3]["q"] is None
    assert rows[3]["fp"] == rows[1]["fp"]  # both collapse to the '' shingle
    # whitespace runs collapse in tokenization
    assert rows[4]["n_tok"] == 2 and rows[4]["shingles"] == ["spaced out"]


def test_cosine_of_zero_vector_is_null(spark):
    from data_engineering_datawarehousingandetlpipeline_spark.operators.similarity import (
        cosine,
    )

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got == [None, 1.0]


def test_repetition_signals_on_short_and_repetitive_docs(spark):
    """Bigram repetition fractions: a sub-2-token doc falls back to one
    whole-text 'bigram' (share 1.0, dup 0.0); a doc that is one phrase
    repeated must score dup_bigram_fraction near 1."""
    df = spark.createDataFrame(
        [
            (1, "solo"),
            (2, "a b"),
            (3, "spam spam spam spam spam"),
            (4, "all bigrams here are unique"),
        ],
        "doc_id long, text string",
    )
    bigrams = df.select(
        "doc_id", F.explode(tx.word_shingles(F.col("text"), 2)).alias("bg")
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    got = {
        r.doc_id: (r.top, r.dup, r.total)
        for r in counts.groupBy("doc_id")
        .agg(
            F.max("c").alias("top"),
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)).alias("dup"),
            F.sum("c").alias("total"),
        )
        .collect()
    }
    assert got[1] == (1, 0, 1)  # whole-text fallback
    assert got[2] == (1, 0, 1)  # exactly 2 tokens -> one real bigram
    assert got[3] == (4, 4, 4)  # 'spam spam' x4: all occurrences duplicated
    assert got[4] == (1, 0, 4)  # unique bigrams -> no duplication


def test_decontamination_overlap_requires_full_ngram(spark):
    """An 8-gram match requires 8 contiguous shared tokens: doc 10 copies
    benchmark doc 0's opening 8 tokens (flagged); doc 11 shares only 7
    contiguous tokens (clean); doc 12 is a short doc equal to a short
    benchmark doc (whole-text fallback still matches)."""
    bench0 = "t1 t2 t3 t4 t5 t6 t7 t8 tail9 tail10"
    df = spark.createDataFrame(
        [
            (0, bench0),
            (50, "tiny doc"),
            (10, "t1 t2 t3 t4 t5 t6 t7 t8 different end"),
            (11, "t1 t2 t3 t4 t5 t6 t7 x y z"),
            (12, "tiny doc"),
        ],
        "doc_id long, text string",
    )

    def posts(d, alias):
        return d.select(
            F.col("doc_id").alias(alias),
            F.explode(
                F.array_distinct(tx.word_shingles(F.col("text"), 8))
            ).alias("ngram"),
        )

    is_bench = (F.col("doc_id") % 50) == 0
    flagged = {
        r.doc_id: r.bench_id
        for r in posts(df.filter(~is_bench), "doc_id")
        .join(F.broadcast(posts(df.filter(is_bench), "bench_id")), "ngram")
        .groupBy("doc_id")
        .agg(F.min("bench_id").alias("bench_id"))
        .collect()
    }
    assert 10 in flagged and flagged[10] == 0
    assert 11 not in flagged
    assert flagged[12] == 50


def test_chunk_documents_boundaries(spark):
    """Chunk-count formula and final-window truncation, at chunk=4/stride=3:
    n <= 4 -> one chunk; n = 10 -> starts 0,3,6 with the last window ending
    exactly at the doc; n = 9 -> last window truncated to 3 tokens. Overlap
    tokens (chunk - stride = 1) repeat across consecutive chunks."""
    df = spark.createDataFrame(
        [
            (1, ""),                                # '' token -> 1 chunk
            (2, "a b c d"),                         # n == chunk -> 1 chunk
            (3, "a b c d e"),                       # n == chunk+1 -> 2 chunks
            (4, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),  # exact final window
            (5, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),      # truncated final window
        ],
        "doc_id long, text string",
    )
    out = tx.chunk_documents(df, chunk_size=4, stride=3)
    got: dict[int, list[tuple[int, str]]] = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.n_chunk_tokens, r.chunk_text))
    assert got[1] == [(1, "")]
    assert got[2] == [(4, "a b c d")]
    assert got[3] == [(4, "a b c d"), (2, "d e")]
    assert got[4] == [
        (4, "t1 t2 t3 t4"),
        (4, "t4 t5 t6 t7"),
        (4, "t7 t8 t9 t10"),
    ]
    assert got[5] == [(4, "t1 t2 t3 t4"), (4, "t4 t5 t6 t7"), (3, "t7 t8 t9")]


def test_chunk_documents_rejects_gapping_stride():
    import pytest

    from data_engineering_datawarehousingandetlpipeline_spark.operators.text import (
        chunk_documents,
    )

    with pytest.raises(ValueError):
        chunk_documents(None, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_size=4, stride=0)


def test_semantic_dedup_greedy_shadowing(spark):
    """The one-pass rule: prune iff ANY smaller-id cluster-mate matches.
    a(0°) ~ b(10°), b ~ c(20°), a !~ c at threshold cos(15°) — b is pruned
    by a, and c is pruned by the already-pruned b (a pruned vector still
    shadows later ids; documented single-sweep convention)."""
    import math

    from data_engineering_datawarehousingandetlpipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    df = spark.createDataFrame(
        [(0, at(0.0)), (1, at(10.0)), (2, at(20.0))],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.pruned
        for r in semantic_dedup(
            df, threshold=0.96, n_centroids=1, iterations=1
        ).collect()
    }
    assert out == {0: False, 1: True, 2: True}


def test_semantic_dedup_is_cluster_bounded(spark):
    """Cross-cluster near-identical vectors are NOT compared: two opposite
    groups seed two centroids, and a pair split across them never produces
    an edge even at cosine 1.0 — the quadratic work is bounded by the
    cluster, which is the operator's entire scale contract."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # seeds centroid 0
            (1, [-1.0, 0.1]),  # seeds centroid 1
            (2, [1.0, 0.0]),   # exact dup of 0, same cluster -> pruned
            (3, [-1.0, 0.1]),  # exact dup of 1, same cluster -> pruned
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.cid, r.pruned)
        for r in semantic_dedup(
            df, threshold=0.99, n_centroids=2, iterations=1
        ).collect()
    }
    assert out[0] == (0, False) and out[2] == (0, True)
    assert out[1] == (1, False) and out[3] == (1, True)


def test_source_rollup_null_quality_contract(spark):
    """A doc whose quality is NULL (empty text) still counts toward n_docs
    but neither toward the decimal-anchored average (COUNT(quality)
    denominator) nor toward ok_fraction's numerator (NULL >= t is false in
    the CASE/when on both engines). Exercises the SAME operator the
    registered doc_source_stats query uses."""
    df = spark.createDataFrame(
        [("a", 0.8), ("a", None), ("b", 0.1)],
        "source string, quality double",
    )
    got = {
        r.source: (r.n_docs, r.avg_quality, r.ok_fraction, r.flagged)
        for r in tx.source_quality_rollup(
            df, min_quality=0.3, min_ok_fraction=0.5
        ).collect()
    }
    assert got["a"] == (2, 0.8, 0.5, False)  # NULL: in n_docs, not avg/ok
    assert got["b"] == (1, 0.1, 0.0, True)


def test_decontamination_catches_short_benchmark_doc_in_long_training_doc(
    spark, tmp_path
):
    """A benchmark doc SHORTER than the n-gram width quoted verbatim inside
    a LONG training doc must be flagged: the training side emits k-grams
    for each distinct short bench width, so the bench doc's whole-text
    fallback gram finds its match. Exercises the registered query via a
    synthetic documents table."""
    from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
        q_doc_decontaminate,
    )

    rows = [
        # doc_id % 50 == 0 -> benchmark side; 5 tokens (< width 8)
        (0, "alpha beta gamma delta epsilon"),
        # long training doc quoting the bench doc verbatim mid-text
        (1, "intro words here alpha beta gamma delta epsilon and a longer tail"),
        # long training doc without the quote
        (2, "totally unrelated content spanning more than eight whole tokens here"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.first_bench_id
        for r in q_doc_decontaminate(spark, str(tmp_path)).collect()
    }
    assert got == {1: 0}
