"""Contract tests for the round-5 second wave: span-level dedup stats,
PII scan/redaction, int8 embedding quantization, domain mixture
reweighting, retention cohorts, and the ordered conversion funnel.

The registry oracle-parity suite value-checks each registered query
end-to-end; these tests pin the operator CONTRACTS — the semantic claims
(redaction priority, error bounds, strict funnel ordering) that a hash
match alone would not explain if it broke.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    dedup as dd,
)
from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    similarity as sim,
)
from data_engineering_datawarehousingandetlpipeline_spark.operators import (
    text as tx,
)
from data_engineering_datawarehousingandetlpipeline_spark.plans import (
    analytics as an,
)
from data_engineering_datawarehousingandetlpipeline_spark.plans import (
    extensions as ex,
)
from tests.conftest import SF_DIR

# ------------------------------------------------------------------- PII


def _pii_df(spark):
    rows = [
        (0, "contact me at jane.doe+spam@example.co.uk for details", "a"),
        (1, "server at 10.0.255.3 answered", "a"),
        (2, "call +1 (555) 123-4567 now", "b"),
        (3, "account 123456789012 was closed", "b"),
        (4, "clean text with number 42 and dots...", "b"),
        (5, "two mails: a@b.io c@d.org and ip 1.2.3.4", "c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_pii_counts_per_pattern(spark):
    df = _pii_df(spark)
    got = {
        r.doc_id: r
        for r in df.select("doc_id", *tx.pii_counts(F.col("text"))).collect()
    }
    assert got[0].email_hits == 1 and got[0].ipv4_hits == 0
    assert got[1].ipv4_hits == 1
    assert got[2].phone_hits == 1
    assert got[3].id_number_hits == 1
    assert got[4].email_hits + got[4].ipv4_hits + got[4].phone_hits == 0
    assert got[4].id_number_hits == 0  # 42 is too short for an id
    assert got[5].email_hits == 2 and got[5].ipv4_hits == 1


def test_pii_redaction_replaces_and_preserves_rest(spark):
    df = _pii_df(spark)
    out = {
        r.doc_id: r.red
        for r in df.select(
            "doc_id", tx.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert out[0] == "contact me at <EMAIL> for details"
    assert out[1] == "server at <IPV4> answered"
    assert out[2] == "call <PHONE> now"
    assert out[3] == "account <ID_NUMBER> was closed"
    assert out[4] == "clean text with number 42 and dots..."
    assert out[5] == "two mails: <EMAIL> <EMAIL> and ip <IPV4>"


def test_pii_redaction_priority_email_before_id(spark):
    # an address containing a long digit run must redact as ONE email,
    # not have its digits punched out by the id_number pattern first
    df = spark.createDataFrame(
        [(0, "mail 123456789012@example.com end")], ["doc_id", "text"]
    )
    red = df.select(tx.redact_pii(F.col("text")).alias("r")).first().r
    assert red == "mail <EMAIL> end"


def test_pii_scan_rollup_counts(spark):
    rows = {r.source: r for r in tx.pii_scan(_pii_df(spark)).collect()}
    assert rows["a"].n_docs == 2 and rows["a"].n_docs_with_pii == 2
    assert rows["b"].n_docs == 3 and rows["b"].n_docs_with_pii == 2
    assert rows["c"].total_email_hits == 2
    # redaction delta is the length change, summable and sign-stable here
    assert rows["b"].total_redact_delta != 0


# ------------------------------------------------------------ span dedup


def test_span_dedup_exact_copies_are_fully_duplicated(spark):
    w = dd.SPAN_WIDTH
    base = " ".join(f"tok{i}" for i in range(w + 4))  # 12 tokens, 5 grams
    other = " ".join(f"uniq{i}" for i in range(w + 4))
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, other)], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in dd.duplicated_span_stats(df).collect()}
    assert got[0].n_spans == 5 and got[0].dup_frac == 1.0
    assert got[1].dup_frac == 1.0
    assert got[2].n_spans == 5 and got[2].dup_frac == 0.0


def test_span_dedup_partial_overlap_matches_bruteforce(spark):
    w = dd.SPAN_WIDTH
    shared = [f"s{i}" for i in range(w)]  # one shared 8-gram
    a = shared + [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)] + shared
    docs = {0: a, 1: b}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], ["doc_id", "text"]
    )
    # brute force: count each doc's w-grams, mark those appearing >= 2x
    from collections import Counter

    grams = {
        i: [tuple(t[j : j + w]) for j in range(len(t) - w + 1)]
        for i, t in docs.items()
    }
    corpus = Counter(g for gs in grams.values() for g in gs)
    got = {r.doc_id: r for r in dd.duplicated_span_stats(df).collect()}
    for i, gs in grams.items():
        dup = sum(1 for g in gs if corpus[g] >= 2)
        assert got[i].n_spans == len(gs)
        assert got[i].n_dup_spans == dup


def test_span_dedup_short_doc_uses_whole_text_fallback(spark):
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc"), (2, "other tiny")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in dd.duplicated_span_stats(df).collect()}
    assert got[0].n_spans == 1 and got[0].dup_frac == 1.0
    assert got[2].n_spans == 1 and got[2].dup_frac == 0.0


# ---------------------------------------------------------- quantization


def test_quantize_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(0, [3.2, -1.5, 0.0, 127.0]), (1, [-0.001, 0.0005, 0.0002, 0.0])],
        ["vec_id", "embedding"],
    )
    out = df.select(
        "vec_id",
        F.col("embedding").alias("v"),
        sim.dequantize(sim.scalar_quantize(F.col("embedding"))).alias("d"),
        sim.scalar_quantize(F.col("embedding"))["scale"].alias("s"),
    ).collect()
    for r in out:
        # symmetric int8: per-component error is at most scale/2
        for x, y in zip(r.v, r.d):
            assert abs(x - y) <= r.s / 2 + 1e-12
        # the max-magnitude component lands exactly on a level
        mx = max(abs(x) for x in r.v)
        assert any(abs(abs(y) - mx) < 1e-9 for y in r.d)


def test_quantize_zero_vector_reconstructs_exactly(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0, 0.0])], ["vec_id", "embedding"])
    r = df.select(
        sim.dequantize(sim.scalar_quantize(F.col("embedding"))).alias("d")
    ).first()
    assert r.d == [0.0, 0.0, 0.0]


def test_quantization_profile_cosine_near_one(spark):
    prof = sim.quantization_error_profile(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ).collect()
    assert len(prof) > 0
    for r in prof:
        assert r.avg_cos_rec > 0.999  # int8 must preserve direction
        assert r.avg_mse >= 0 and r.worst_abs_err >= 0


# ------------------------------------------------------- mixture weights


def test_mixture_weights_inverse_to_token_share(spark):
    rows = ex.q_doc_mixture_weights(spark, SF_DIR).collect()
    total = sum(r.n_tokens for r in rows)
    n_sources = len(rows)
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        expect = min(
            ex.MIXTURE_MAX_WEIGHT, total / (n_sources * r.n_tokens)
        )
        assert abs(r.resample_weight - expect) < 1e-6


def test_mixture_weight_cap_applies(spark):
    df = spark.createDataFrame(
        [(0, "one token tiny", "rare")]
        + [(i, "many tokens " * 50, "big") for i in range(1, 20)],
        ["doc_id", "text", "source"],
    )

    # run the plan body against an in-memory frame via a monkeypatched loader
    per = df.groupBy("source").agg(
        F.sum(tx.token_count(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"), F.count("*").cast("double").alias("k"))
    got = {
        r.source: r.w
        for r in per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.least(
                F.lit(ex.MIXTURE_MAX_WEIGHT),
                F.col("t") / (F.col("k") * F.col("n_tokens")),
            ).alias("w"),
        )
        .collect()
    }
    assert got["rare"] == ex.MIXTURE_MAX_WEIGHT  # capped
    assert got["big"] < 1.0


# ------------------------------------------------------------- retention


def test_retention_day_zero_is_full(spark):
    rows = an.q_retention_cohorts(spark, SF_DIR).collect()
    assert rows, "cohort triangle must not be empty"
    for r in rows:
        assert 0 <= r.day_offset
        assert 0 < r.n_active <= r.cohort_users
        if r.day_offset == 0:
            # every user is active on their own first day by construction
            assert r.retention_rate == 1.0


# ---------------------------------------------------------------- funnel


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, s), u, t, 0.0, "{}")
            for i, (u, t, s) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_funnel_requires_strict_order(spark, tmp_path, monkeypatch):
    # user 1 converts fully in order; user 2 purchased BEFORE clicking —
    # must not count at the purchase stage; user 3 never signs up.
    ev = _events(
        spark,
        [
            (1, "signup", 0), (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "signup", 0), (2, "view", 10), (2, "purchase", 15), (2, "click", 20),
            (3, "view", 5), (3, "click", 6), (3, "purchase", 7),
        ],
    )
    outdir = str(tmp_path / "events.parquet")
    ev.write.parquet(outdir)
    # point the loader at the staged table
    import data_engineering_datawarehousingandetlpipeline_spark.plans.analytics as mod

    real_load = mod.load_table

    def fake_load(s, sf_dir, name):
        assert name == "events"
        return s.read.parquet(outdir)

    monkeypatch.setattr(mod, "load_table", fake_load)
    try:
        rows = {r.stage: r for r in mod.q_event_funnel(spark, "ignored").collect()}
    finally:
        monkeypatch.setattr(mod, "load_table", real_load)
    assert rows["signup"].n_users == 2  # users 1 and 2
    assert rows["view"].n_users == 2
    assert rows["click"].n_users == 2
    assert rows["purchase"].n_users == 1  # only user 1 kept strict order
    assert rows["purchase"].conversion_rate == 0.5


def test_funnel_counts_monotone_on_corpus(spark):
    rows = sorted(
        an.q_event_funnel(spark, SF_DIR).collect(), key=lambda r: r.stage_idx
    )
    counts = [r.n_users for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rows[0].conversion_rate is None  # no stage before signup
