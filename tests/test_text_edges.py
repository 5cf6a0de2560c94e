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
