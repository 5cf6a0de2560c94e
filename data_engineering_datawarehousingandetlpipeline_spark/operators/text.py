"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure ``pyspark.sql.functions`` column expressions — no
Python UDFs — so they run inside whole-stage codegen and scale linearly
with the scan. Tokenization is a shared, deterministic contract (lowercase,
trim, split on runs of whitespace) that the DuckDB oracles reproduce
verbatim, making every operator value-hash comparable across engines.

Operators: tokenization/token stats, stopword-based language ID, heuristic
quality scoring, and word-shingle fingerprinting (SURVEY.md §2.11; the
north-star LLM-pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword sets for the n-gram/stopword language heuristic.
#: Deliberately small + frozen: the oracle SQL embeds the same literals.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "y", "que", "un"),
    "fr": ("le", "les", "des", "et", "une", "dans"),
}
#: Language priority for deterministic argmax tie-breaking.
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "es", "fr")

#: Shingle width for word-level fingerprints / near-dup shingling.
SHINGLE_WIDTH = 3


def tokens(text: Column) -> Column:
    """Deterministic tokenizer: lowercase, trim, split on whitespace runs."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, lang: str) -> Column:
    """How many tokens are in ``lang``'s stopword set (JVM-side filter)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def predicted_lang(text: Column) -> Column:
    """Stopword-score argmax with fixed priority order (deterministic ties).

    A real deployment would use a trained identifier; the heuristic keeps
    the operator UDF-free and engine-comparable while exercising the same
    plumbing (per-doc scores → argmax → label).
    """
    scores = {lang: stopword_count(text, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def punct_count(text: Column) -> Column:
    """Number of non-word, non-space characters."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0, 1]: length, stopword, and punctuation terms.

    score = 0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·(1 − punct_ratio)

    Every term is a deterministic double expression; the oracle embeds the
    identical formula, so results are bit-comparable.
    """
    n_tok = token_count(text).cast("double")
    # try_divide: empty text has length 0 — ANSI `/` would throw, while the
    # oracle engine yields NULL for division by zero; NULL propagates to a
    # NULL score, identically in both engines.
    stop_ratio = F.try_divide(stopword_count(text, "en").cast("double"), n_tok)
    p_ratio = F.try_divide(
        punct_count(text).cast("double"), F.length(text).cast("double")
    )
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - p_ratio)
    )


def word_shingles(text: Column, width: int = SHINGLE_WIDTH) -> Column:
    """All ``width``-word shingles (contiguous) as strings.

    Short documents (< width tokens) yield one whole-text shingle so no
    document silently drops out of fingerprinting.
    """
    toks = tokens(text)
    n = F.size(toks)
    # Zip `width` shifted copies of the token array and concat each struct.
    # The naive per-start formulation (transform over a start index, slicing
    # inside the lambda) re-evaluates the tokenizer once per shingle — O(n)
    # regex splits per row, since codegen cannot hoist subexpressions out of
    # higher-order-function lambdas. This form references the token array
    # only `width` times per row (~10× faster on real documents). The slice
    # length is the token count itself (never a fixed literal — a cap would
    # silently truncate shingle coverage on very long documents).
    zipped = F.arrays_zip(
        *[F.slice(toks, k + 1, n).alias(f"t{k}") for k in range(width)]
    )
    windows = F.slice(zipped, 1, F.greatest(n - F.lit(width - 1), F.lit(1)))
    return F.when(
        n >= width,
        F.transform(
            windows,
            lambda s: F.concat_ws(" ", *[s[f"t{k}"] for k in range(width)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def fingerprint(text: Column, width: int = SHINGLE_WIDTH) -> Column:
    """Document fingerprint: lexicographic min of md5 over word shingles.

    A 1-permutation MinHash — robust to local edits (any shared shingle can
    carry the min), constant-size output, and identical in any engine with
    md5. Computed per-row inside codegen; no shuffle.
    """
    return F.array_min(F.transform(word_shingles(text, width), F.md5))


#: BPE-ish pre-tokenizer pattern: letter runs, digit runs, single other
#: marks — the split a byte-pair tokenizer applies before merges. The
#: whitespace class is spelled out explicitly because ``\s`` itself is NOT
#: portable: Java's includes vertical tab (\x0b), RE2's (the oracle
#: engine's) does not. Explicit classes + alternation are interpreted
#: identically by both.
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]"

#: A run of whitespace, spelled with the same explicit portable class as
#: BPE_SPLIT_PATTERN (Java's ``\s`` includes \x0b, RE2's does not — an
#: implicit class would make the two engines disagree on exactly the
#: documents that contain vertical tabs).
WS_RUN_PATTERN = r"[ \t\n\x0b\f\r]+"


def bpe_pieces(text: Column) -> Column:
    """Pre-tokenizer pieces of lowercased text (array<string>).

    A real BPE would follow with merge ranks over a learned vocabulary;
    the piece split is the part that is engine-portable and is what token
    COUNTING needs (piece count upper-bounds the BPE token count).
    """
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_SPLIT_PATTERN), 0)


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document text-analysis profile (one scan, all column expressions)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(text).alias("n_tokens"),
        distinct_token_count(text).alias("n_distinct_tokens"),
        F.length(text).alias("n_chars_measured"),
        predicted_lang(text).alias("predicted_lang"),
        F.round(quality_score(text), 6).alias("quality"),
        fingerprint(text).alias("fingerprint"),
    )


def pack_token_bins(
    sized: DataFrame,
    capacity: int,
    shard_docs: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Deterministic sequence packing over (id, token-count) rows.

    Docs are laid out contiguously in ``id_col`` order within a shard
    (``id div shard_docs``); ``offset_tokens`` is the running total before
    the doc and ``bin_in_shard`` is ``offset div capacity`` — a doc whose
    tokens cross the boundary starts the spillover in the next bin. Fully
    order-determined: any engine reproduces the identical packing. The
    cumulative window is PARTITIONED BY shard, so at warehouse scale every
    shard packs independently after one shuffle — a global-order window
    would serialize the whole corpus on one task.
    """
    from pyspark.sql import Window

    # integral `div`, never double `/`: ids beyond 2^53 lose low bits in a
    # double and land in the wrong shard (doubles space > 1 apart there)
    shard = F.expr(f"{id_col} div {shard_docs}").alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return (
        sized.select(F.col(id_col), shard, F.col(tokens_col))
        .select(
            id_col,
            "shard",
            tokens_col,
            (cum - F.col(tokens_col)).alias("offset_tokens"),
        )
        .select(
            id_col,
            "shard",
            tokens_col,
            F.expr(f"offset_tokens div {capacity}").alias("bin_in_shard"),
            "offset_tokens",
        )
    )


def source_quality_rollup(
    scored: DataFrame,
    min_quality: float,
    min_ok_fraction: float,
    source_col: str = "source",
    quality_col: str = "quality",
) -> DataFrame:
    """Per-source quality rollup over (source, quality) rows.

    ``n_docs`` counts every row; a NULL quality (unscorable doc) is
    excluded from the decimal-anchored average (COUNT(quality)
    denominator) and fails the ``>= min_quality`` test (CASE/when on both
    engines), so it never inflates ``ok_fraction``. ``flagged`` marks
    sources whose ok_fraction falls below the floor — the drop-domain
    decision. All aggregation is map-side partial.
    """
    from data_engineering_datawarehousingandetlpipeline_spark.functions.numeric import (
        davg,
    )

    q = F.col(quality_col)
    ok_fraction = F.try_divide(
        F.sum(F.when(q >= min_quality, 1).otherwise(0)).cast("double"),
        F.count("*"),
    )
    return (
        scored.groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.round(davg(q, wide=True), 6).alias("avg_quality"),
            ok_fraction.alias("ok_fraction"),
        )
        .withColumn("flagged", F.col("ok_fraction") < min_ok_fraction)
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort_output: bool = True,
) -> DataFrame:
    """Split documents into overlapping fixed-token windows (chunking).

    The context-window prep step of a pretraining/RAG pipeline: each doc
    becomes chunks of ``chunk_size`` tokens starting every ``stride``
    tokens (overlap = ``chunk_size - stride``; require ``stride <=
    chunk_size`` so coverage has no gaps). Chunk count is
    ``1 + ceil(max(0, n - chunk_size) / stride)`` — a doc shorter than one
    window still yields its single (short) chunk, and the final window is
    truncated at the document end rather than padded.

    Implementation is one narrow scan: tokenize once, explode a
    ``sequence()`` of chunk indices, ``slice()`` the token array per
    index — all JVM-side array expressions, no UDF, no shuffle (the
    explode fan-out is bounded by n/stride and stays partition-local).
    Output (id, chunk_id, n_chunk_tokens, chunk_text) ordered by
    (id, chunk_id).
    """
    if not 0 < stride <= chunk_size:
        raise ValueError(f"need 0 < stride <= chunk_size, got {stride=} {chunk_size=}")
    n = F.size("toks")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(F.lit(0), n - chunk_size) + (stride - 1)) / F.lit(stride)
    ).cast("int")
    chunk = F.slice("toks", F.col("chunk_id") * stride + 1, chunk_size)
    # NULL text coalesces to an empty token array → one empty chunk, so
    # the "every doc yields ≥ 1 chunk" contract holds for NULL-text docs
    # too (without this, a NULL n_chunks makes explode drop the doc).
    toks = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    out = (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(
            id_col,
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
    # sort_output=False: every expression above is stateless, so the
    # operator composes directly with Structured Streaming (global sort is
    # both unsupported and meaningless on an unbounded stream — readers
    # order on consumption).
    return out.orderBy(id_col, "chunk_id") if sort_output else out


#: Gopher rule thresholds (Rae et al. 2021, Table A1) — the canonical
#: pretraining quality-filter battery. Kept verbatim even where the
#: synthetic corpus makes a rule strict (e.g. the 50-word floor): the
#: operator's contract is the PAPER's filter, and each rule surfaces as
#: its own boolean so a deployment re-weights by flipping thresholds,
#: not rewriting expressions.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRACTION = 0.9
GOPHER_MAX_ELLIPSIS_FRACTION = 0.3
GOPHER_MIN_ALPHA_FRACTION = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher rule battery: one boolean per rule + ``keep``.

    All seven rules evaluate in ONE codegen'd scan as pure column
    expressions (token folds, line splits, portable regex counts — no
    UDF, no shuffle before the output sort). A NULL text yields NULL
    rules and a NULL keep on both engines — unscoreable, not silently
    kept or dropped. Complements :func:`quality_score` (a continuous
    heuristic) with the paper's named go/no-go filter.
    """
    text = F.col(text_col)
    toks = tokens(text)
    n = F.size(toks).cast("double")
    mean_len = F.round(
        F.try_divide(
            F.aggregate(
                F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
            ).cast("double"),
            n,
        ),
        6,
    )
    symbol_ratio = F.round(
        F.try_divide(
            (
                F.regexp_count(text, F.lit("#"))
                + F.regexp_count(text, F.lit(r"\.\.\."))
            ).cast("double"),
            n,
        ),
        6,
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = F.round(
        F.try_divide(
            F.size(
                F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
            ).cast("double"),
            n_lines,
        ),
        6,
    )
    ellipsis_frac = F.round(
        F.try_divide(
            F.size(
                F.filter(
                    lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")
                )
            ).cast("double"),
            n_lines,
        ),
        6,
    )
    alpha_frac = F.round(
        F.try_divide(
            F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double"),
            n,
        ),
        6,
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    rules = {
        "rule_word_count": (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS),
        "rule_mean_len": (mean_len >= GOPHER_MIN_MEAN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_LEN),
        "rule_symbol_ratio": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "rule_bullets": bullet_frac <= GOPHER_MAX_BULLET_FRACTION,
        "rule_ellipsis": ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRACTION,
        "rule_alpha": alpha_frac >= GOPHER_MIN_ALPHA_FRACTION,
        "rule_stopwords": n_stop >= GOPHER_MIN_STOPWORDS,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )


#: PII detection patterns, in REDACTION PRIORITY order (email before bare
#: digit-runs, so an address is replaced whole rather than having its
#: digits punched out first). Engine-portable regex subset only: character
#: classes, counted repetition, alternation, word boundaries — no
#: lookaround, no backreferences — so Java's regex (Spark) and RE2 (the
#: DuckDB oracle) agree match-for-match. Patterns match on the RAW text
#: (PII is case-normalizable but redaction must preserve surrounding case,
#: so classes spell out both cases instead of lowercasing the document).
#:
#: Precision/recall stance (a scrub audit wants few false alarms; recall
#: gaps are listed so they are chosen, not accidental):
#: - ipv4 octets are range-checked (0-255 via alternation), so 999.9.9.9
#:   no longer counts; without lookaround a DOTTED RUN LONGER THAN FOUR
#:   OCTETS still matches its first four ("1.2.3.4.5" hits on "1.2.3.4") —
#:   version strings that deep are rare and an over-redaction there is the
#:   safe failure direction.
#: - phone requires the international '+' prefix: national formats like
#:   "(555) 123-4567" are NOT detected (a bare-digit-run rule loose enough
#:   to catch them would false-positive on prices, ranges and dates);
#:   9+-digit national numbers still fall through to id_number.
_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", rf"\b{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}\b"),
    ("phone", r"\+[0-9][0-9 ()./-]{6,}[0-9]"),
    ("id_number", r"\b[0-9]{9,}\b"),
)


def pii_counts(text: Column) -> list[Column]:
    """Per-pattern match counts, one ``<kind>_hits`` int column each.

    Pattern k is counted on the text with patterns 1..k-1 already replaced
    — the same sequence :func:`redact_pii` applies — so the counts describe
    exactly what redaction rewrites: a digit-run inside an email is ONE
    email hit, never also an id_number hit. (Counting every pattern on the
    raw text would overstate exposure relative to the actual scrub.)
    """
    cols = []
    cur = text
    for kind, pat in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"{kind}_hits"))
        cur = F.regexp_replace(cur, pat, f"<{kind.upper()}>")
    return cols


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its ``<KIND>`` placeholder.

    Chained ``regexp_replace`` in :data:`PII_PATTERNS` order — a single
    codegen'd pass per pattern, no UDF. Earlier (more specific) patterns
    consume their text before later (more general) ones see it, so an
    email's digits are never double-redacted as an id_number.
    """
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_scan(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group PII exposure profile: hit counts + redaction deltas.

    The pre-release scrub audit of a training-data pipeline: counts per
    pattern, how many documents carry any PII at all, and how many
    characters redaction would rewrite. One scan, all expressions
    codegen'd, one partial-agg shuffle on the group key.
    """
    text = F.col(text_col)
    hit_cols = [f"{kind}_hits" for kind, _ in PII_PATTERNS]
    per_doc = df.select(
        F.col(group_col),
        *pii_counts(text),
        (F.length(redact_pii(text)) - F.length(text)).cast("bigint").alias(
            "redact_delta"
        ),
    )
    any_hit = sum(F.col(c) for c in hit_cols) > 0
    return per_doc.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(any_hit, 1).otherwise(0)).alias("n_docs_with_pii"),
        *[F.sum(c).cast("bigint").alias(f"total_{c}") for c in hit_cols],
        F.sum("redact_delta").alias("total_redact_delta"),
    )
