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
