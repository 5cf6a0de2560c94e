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
#: Round-6 window, 50 = 13 debuts + 5 changed + 32 staleness-limit:
#: the 13 never-driver-verified r6 debuts (streaming_exact_dedup,
#: emb_ivfpq_topk, emb_pq_topk, doc_mixture_sample, emb_hard_negatives,
#: split_leakage_audit, the 5-query curation family, salted_enrich,
#: doc_gopher_rules); the 5 queries whose implementation changed this
#: round (doc_ngram_jaccard + doc_dedup_clusters ride the aliased
#: jaccard_pairs self-join, doc_pii_scan counts sequentially on the
#: progressively-redacted text + tightened ipv4 octets, event_funnel's
#: try_divide/NULLIF convergence, doc_mixture_weights' shared-helper
#: refactor); the 32 r4-green queries rotated out in r5, back for their
#: promised re-verification (COVERAGE.md rotation policy — keeps every
#: registry query ≤ 2 rounds stale). Those three groups fill all 50
#: slots, so the r5 debuts' second rows and the machinery keepers
#: (streaming_ingest, doc_minhash_neardup, emb_ivf_topk) were displaced —
#: the per-entry comments below record each displacement.
#: Rotated out this round (all r5-green, unchanged): emb_near_dup,
#: doc_chunks, doc_exact_dedup, doc_token_stats, doc_lang_profile,
#: doc_quality, doc_fingerprints, doc_simhash, doc_simhash_pairs,
#: doc_tfidf_terms, doc_bpe_tokens, doc_hash_sample, doc_pack_bins,
#: doc_norm_dedup, media_features, media_feature_vectors,
#: media_frame_sample, emb_cosine_topk, emb_ann_topk, doc_repetition,
#: doc_decontaminate, emb_semantic_dedup, doc_source_stats,
#: doc_split_assign, streaming_window_stats, streaming_sessions,
#: sessionization, session_stats, asof_last_error, nearby_clicks,
#: day_window, dedup_keep_first, dedup_hourly_last, pricing_summary,
#: approx_sketches.
WINDOW_HEAD: tuple[str, ...] = (
    # r6 debuts (emb_pq_topk took the slot of the emb_ivf_topk keeper:
    # r5-green unchanged, and the two debut quantization queries exercise
    # the same k-means machinery plus the codebook generalization)
    "streaming_exact_dedup",
    "emb_ivfpq_topk",
    "emb_pq_topk",
    "doc_mixture_sample",
    # changed this round
    "doc_ngram_jaccard",
    "doc_dedup_clusters",
    "doc_pii_scan",
    "event_funnel",
    "doc_mixture_weights",
    # the 32 r4-green queries rotated back in (last driver row r4)
    "long_term_users",
    "event_grouping_sets",
    "click_days_no_purchase",
    "user_day_overlap",
    "user_rolling_stats",
    "value_correlations",
    "doc_edit_distance",
    "dup_audit",
    "missingness",
    "outliers",
    "filtered_count",
    "max_ts_per_user",
    "watermark_filter",
    "schema_projection",
    "validate_counts",
    "hourly_rollup",
    "json_props",
    "composite_sort",
    "region_revenue",
    "top_customers",
    "order_priority",
    "supplier_volume",
    "part_type_stats",
    "revenue_rollup",
    "event_cube",
    "top_orders_per_customer",
    "pivot_daily",
    "salted_rollup",
    "distinct_counts",
    "value_quantiles",
    "dup_audit_hourly",
    "dashboard_summary",
    # r6 debut (late): contrastive-pair mining — took doc_ngram_topk's
    # second-row slot (r5-green, unchanged, stays ≤ 2 rounds stale for
    # its promised r7 re-verification; never-verified debuts outrank
    # second rows)
    "emb_hard_negatives",
    # r6 debut (late): split-leakage audit — took retention_cohorts'
    # second-row slot (same ≤-2-rounds-stale reasoning as above)
    "split_leakage_audit",
    # r6 debuts (curation family, plans/curation.py) — never driver-verified,
    # so they outrank second rows: these five took the slots of the r5
    # debuts' second rows (doc_span_dedup, emb_quantize_stats,
    # doc_group_sample, emb_cluster_profile, streaming_chunks — all
    # r5-green, unchanged, due back ≤ r7 under the 2-round-stale policy)
    "doc_dsir_weights",
    "doc_cluster_keep",
    "dedup_cluster_stats",
    "doc_vocab_drift",
    "source_overlap",
    # r6 debuts (late): salted skew join and the Gopher rule battery —
    # these took the streaming_ingest and doc_minhash_neardup keeper
    # slots (both r5-green and unchanged; streaming gets two fresh rows
    # this round via streaming_chunks + streaming_exact_dedup, and the
    # minhash path keeps its CI plan gates + sf0.001 parity coverage)
    "salted_enrich",
    "doc_gopher_rules",
)
#: r7 DEBUT QUEUE — queries implemented late in r6, after all 50 window
#: slots were already owed (debuts + changed code + the 32 queries at the
#: 2-round staleness limit left nothing rotatable): scd2_user_state,
#: incremental_rollup, scd2_snapshots, streaming_scd2,
#: incremental_distinct, event_unpivot, doc_perplexity. All are
#: local-oracle-verified (sf0.001 pytest parity + sf0.01 sweep) and MUST
#: take window slots in r7.
#:
#: r7 WINDOW MATH (decide deliberately, not by slip): owed at r7 =
#: 45 r5-green queries rotated out this round (the 35 listed above plus
#: the 10 displaced second-rows/keepers — all hit the 2-round staleness
#: limit at r7) + the 7 debuts above. doc_split_assign is among the 45
#: AND changed this round (shared-_split_expr refactor; its in-window
#: twin split_leakage_audit gets its r6 row on the refactored code, so
#: only the out-of-window side needs the changed-code slot). Total = 52
#: candidates for 50 slots.
#: Resolution: the staleness policy bends (one round, to ≤ 3) for the
#: queries with the strongest non-driver evidence and multiply-green
#: history — recommend deferring dedup_keep_first and dedup_hourly_last
#: (green r2/r3/r5, unchanged, exercised end-to-end by the cleaning
#: pytest suite) to r8. Never defer a debut or a changed query.


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
