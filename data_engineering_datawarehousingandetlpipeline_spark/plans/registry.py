"""Query registry: every operator from SURVEY.md §2 surfaces here as a named
query with (a) a Spark DataFrame plan and (b) an ANSI-SQL oracle twin that
DuckDB runs over the same parquet tables. The driver's correctness gate
compares the two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides,
- every float aggregate is decimal-anchored (functions/numeric.py),
- result orderings carry a deterministic tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One named query: Spark plan + optional DuckDB oracle SQL."""

    name: str
    fn: QueryFn
    oracle: str | None = None
    description: str = ""
    bench: bool = False  # headline query timed by bench.py
    tags: tuple[str, ...] = field(default=())


#: The driver's per-round CORRECTNESS snapshot covers only the FIRST 50
#: registry entries; these names are pulled to the head, in this order,
#: and everything else follows in module order. Rotation policy (also in
#: COVERAGE.md): a query whose implementation changed, or that has never
#: been driver-verified, MUST be in this list; multiply-green unchanged
#: queries rotate out to make room and rotate back in later rounds.
#:
#: Round-7 window, 50 = 7 debuts + 43 staleness-limit rotations —
#: executing the r6 window math exactly as pre-committed below the r6
#: entry in git history: owed at r7 were the 45 r5-green queries rotated
#: out in r6 (the 35-name r6 rotation list plus the 10 displaced
#: second-rows/keepers) + the 7 r6-late debuts = 52 candidates for 50
#: slots. Resolution (pre-decided in r6, confirmed by the r6 verdict):
#: defer dedup_keep_first and dedup_hourly_last to r8 — green
#: r1/r2/r3/r4/r5, implementation unchanged since r3, exercised
#: end-to-end by tests/test_cleaning.py every pytest run — bending the
#: staleness policy to ≤ 3 rounds for exactly these two. Never defer a
#: debut or a changed query: doc_split_assign (changed in r6,
#: shared-_split_expr refactor, no r6 row of its own) is inside.
#: Rotated out this round (all green r6 rows, unchanged since):
#: streaming_exact_dedup, emb_ivfpq_topk, emb_pq_topk,
#: doc_mixture_sample, doc_ngram_jaccard, doc_dedup_clusters,
#: doc_pii_scan, event_funnel, doc_mixture_weights, long_term_users,
#: event_grouping_sets, click_days_no_purchase, user_day_overlap,
#: user_rolling_stats, value_correlations, doc_edit_distance, dup_audit,
#: missingness, outliers, filtered_count, max_ts_per_user,
#: watermark_filter, schema_projection, validate_counts, hourly_rollup,
#: json_props, composite_sort, region_revenue, top_customers,
#: order_priority, supplier_volume, part_type_stats, revenue_rollup,
#: event_cube, top_orders_per_customer, pivot_daily, salted_rollup,
#: distinct_counts, value_quantiles, dup_audit_hourly, dashboard_summary,
#: emb_hard_negatives, split_leakage_audit, doc_dsir_weights,
#: doc_cluster_keep, dedup_cluster_stats, doc_vocab_drift,
#: source_overlap, salted_enrich, doc_gopher_rules.
WINDOW_HEAD: tuple[str, ...] = (
    # the 7 r6-late debuts — the only registry queries that have never
    # received a driver row; they take slots first, per policy
    "scd2_user_state",
    "scd2_snapshots",
    "streaming_scd2",
    "incremental_rollup",
    "incremental_distinct",
    "event_unpivot",
    "doc_perplexity",
    # changed in r6 without an r6 row of its own (split_leakage_audit
    # carried the refactored _split_expr through r6; this is the
    # out-of-window side)
    "doc_split_assign",
    # the 35-name r6 rotation list, minus the two pre-decided deferrals
    # and doc_split_assign above (last driver row r5 for all)
    "emb_near_dup",
    "doc_chunks",
    # r7 debut: streaming MinHash near-dup index (r6 verdict, marching
    # order 2) — took doc_exact_dedup's slot (green r1/r2/r3/r5; its
    # sha-groupby machinery got a fresh r6 row via streaming_exact_dedup,
    # and sf0.001 pytest parity runs every CI pass; joins the r8 owed set)
    "streaming_minhash_dedup",
    "doc_token_stats",
    "doc_lang_profile",
    "doc_quality",
    # r7 debut: point-in-time SCD2 fact enrichment — took
    # doc_fingerprints's slot (green r1/r2/r3/r5; the shingle/minhash
    # fingerprint machinery is exercised in-window end-to-end by
    # doc_minhash_neardup; joins the r8 owed set)
    "scd2_event_enrich",
    # r7 debut: hybrid RRF retrieval (dense cosine ⊕ BM25 more-like-this)
    # — took doc_simhash's slot (green r1/r2/r3/r5, benched every round
    # with a plan-gated shape, and doc_simhash_pairs stays in-window
    # exercising the same fingerprint fold; joins the r8 owed set)
    "retrieval_rrf",
    "doc_simhash_pairs",
    "doc_tfidf_terms",
    "doc_bpe_tokens",
    "doc_hash_sample",
    "doc_pack_bins",
    "doc_norm_dedup",
    # r7 debut: per-user daily gap-fill with LOCF — took media_features's
    # slot (green r1/r2/r3/r5; media_feature_vectors + media_frame_sample
    # stay in-window exercising the same _media decode plumbing, and the
    # multimodal pytest family runs every CI pass; joins the r8 owed set)
    "event_gapfill",
    "media_feature_vectors",
    "media_frame_sample",
    # r7 debut: one-pass per-column table profile — took emb_cosine_topk's
    # slot (green r1/r2/r3/r5; the exact-cosine machinery gets its r7 row
    # in-window through retrieval_rrf's dense side, and the ANN recall
    # gates baseline against it every CI pass; joins the r8 owed set)
    "lineitem_profile",
    "emb_ann_topk",
    "doc_repetition",
    "doc_decontaminate",
    "emb_semantic_dedup",
    "doc_source_stats",
    "streaming_window_stats",
    "streaming_sessions",
    "sessionization",
    "session_stats",
    "asof_last_error",
    "nearby_clicks",
    "day_window",
    # r7 debut: BM25 retrieval top-k (r6 verdict, marching order 3) —
    # took pricing_summary's slot (green r1–r5, benched every round with
    # a stable gated plan, pytest parity every run; joins the r8 owed set)
    "doc_bm25_topk",
    "approx_sketches",
    # the 10 second-rows/keepers displaced by r6 debuts (last driver row
    # r5 for all; due at the 2-round staleness limit now)
    "doc_ngram_topk",
    "retention_cohorts",
    "doc_span_dedup",
    "emb_quantize_stats",
    "doc_group_sample",
    "emb_cluster_profile",
    "streaming_chunks",
    "streaming_ingest",
    "doc_minhash_neardup",
    "emb_ivf_topk",
)

#: Names that MUST sit inside the driver's 50-entry window this round:
#: every query that has never received a driver row plus every query
#: whose implementation changed since its last green row. Maintained by
#: hand each round alongside WINDOW_HEAD; enforced generically by
#: tools/driver_sweep.py and tests/test_plan_quality.py so a rotation
#: can never silently strand a debut (r6 verdict, marching order 5).
MUST_VERIFY: tuple[str, ...] = (
    "scd2_user_state",
    "scd2_snapshots",
    "streaming_scd2",
    "incremental_rollup",
    "incremental_distinct",
    "event_unpivot",
    "doc_perplexity",
    "doc_split_assign",
    # r7 debuts (this round's new queries — never driver-verified)
    "doc_bm25_topk",
    "streaming_minhash_dedup",
    "retrieval_rrf",
    "event_gapfill",
    "scd2_event_enrich",
    "lineitem_profile",
)

#: r8 DEBUT QUEUE — queries implemented after all 50 r7 slots were
#: spoken for (the same late-debut pattern as r6): doc_quality_deciles,
#: daily_active_cumulative. Both are local-oracle-verified (sf0.001
#: pytest parity every CI run + sf0.01 sweep) and MUST take window slots
#: in r8 (add them to MUST_VERIFY when rotating).
#:
#: r8 OWED SET (window math for next round, decided now, not by slip):
#: owed at r8 = the 49 green-r6 queries rotated out above + the
#: 6 r7-displaced queries (pricing_summary, doc_exact_dedup, doc_simhash,
#: media_features, doc_fingerprints, emb_cosine_topk) + the 2 r7-deferred
#: queries
#: (dedup_keep_first, dedup_hourly_last — at the bent ≤-3-round limit,
#: CANNOT defer again) + the 2 r8-queue debuts above = 59 candidates for
#: 50 slots. Resolution: defer multiply-green
#: unchanged queries from the 49 (recommend dup_audit / dup_audit_hourly
#: — green r1/r2/r3/r4/r6, the deepest histories in the registry after
#: the two cleaning queries) one per extra candidate. Never defer a debut
#: or a changed query.


def all_queries() -> dict[str, QuerySpec]:
    """Assemble the full query surface from the plan modules.

    Ordering: :data:`WINDOW_HEAD` first (the driver's 50-entry correctness
    window), then every remaining query in module order. An unknown name
    in WINDOW_HEAD fails loudly — silently shrinking the verified window
    would be worse than a crash.
    """
    from data_engineering_datawarehousingandetlpipeline_spark.plans import (
        analytics,
        curation,
        extensions,
        pipeline_queries,
        reference_queries,
    )

    specs: dict[str, QuerySpec] = {}
    for module in (pipeline_queries, reference_queries, analytics, extensions, curation):
        for spec in module.QUERIES:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    missing = [name for name in WINDOW_HEAD if name not in specs]
    if missing:
        raise ValueError(f"WINDOW_HEAD names not registered: {missing}")
    ordered = {name: specs[name] for name in WINDOW_HEAD}
    ordered.update((n, s) for n, s in specs.items() if n not in ordered)
    return ordered
