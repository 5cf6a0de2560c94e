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
#: Round-11 window, under the STAGED CATCH-UP AMENDMENT (documented in
#: tools/window_planner.py and forced by the lost round 10: the registry
#: was import-dead when the r10 driver ran, CORRECTNESS_r10.json is
#: empty, so the whole stranded r10 window plus the green-r8 rotations
#: all hit the ≤-3-round staleness limit at once — 2 debuts + 1 changed
#: + 95 exhausted for 50 slots, which no single-round window satisfies).
#: Amended policy, cross-checked by ``python tools/window_planner.py
#: --changed incremental_distinct``:
#:
#: 1. priority order debut → changed → exhausted OLDEST-last-green-first
#:    (name tiebreak);
#: 2. the overflow carries to r12 as pre-committed non-negotiable slots
#:    (the 48 green-r8 rotations listed below DEBUT_QUEUE);
#: 3. compensating evidence for every carried query: the committed
#:    full-registry sweep artifacts SWEEP_SF001_r11.json (sf0.01 — the
#:    same tier and compare the driver performs, hostile-TZ vanilla
#:    session) and SWEEP_SF01_r11.json (sf0.1, the closing-protocol
#:    tier);
#: 4. debuts+changed alone overflowing stays a hard breach.
#:
#: r11 head = 2 debuts (doc_tokenizer_fidelity — the r10 block now
#: properly registered with its oracle, per r10 verdict order 2 —
#: and media_pipeline, stranded twice) + 1 changed-in-r10-never-verified
#: (incremental_distinct) + the 46 green-r7 rotations (4 rounds stale,
#: the oldest debt) + asof_last_error (first green-r8 by name tiebreak)
#: = 50. Never defer a debut or a changed query.
WINDOW_HEAD: tuple[str, ...] = (
    # debuts (never driver-verified; slots first, per policy)
    "doc_tokenizer_fidelity",
    "media_pipeline",
    # changed in r10 (mergeability contract rework), never verified since
    "incremental_distinct",
    # the 46 exhausted green-r7 rotations (4 rounds stale; oldest debt)
    "day_window",
    "doc_bm25_topk",
    "doc_bpe_tokens",
    "doc_chunks",
    "doc_decontaminate",
    "doc_group_sample",
    "doc_hash_sample",
    "doc_lang_profile",
    "doc_minhash_neardup",
    "doc_ngram_topk",
    "doc_norm_dedup",
    "doc_pack_bins",
    "doc_perplexity",
    "doc_quality",
    "doc_repetition",
    "doc_simhash_pairs",
    "doc_source_stats",
    "doc_span_dedup",
    "doc_split_assign",
    "doc_tfidf_terms",
    "doc_token_stats",
    "emb_ann_topk",
    "emb_cluster_profile",
    "emb_ivf_topk",
    "emb_near_dup",
    "emb_quantize_stats",
    "emb_semantic_dedup",
    "event_gapfill",
    "event_unpivot",
    "incremental_rollup",
    "lineitem_profile",
    "media_feature_vectors",
    "media_frame_sample",
    "nearby_clicks",
    "retention_cohorts",
    "retrieval_rrf",
    "scd2_snapshots",
    "scd2_user_state",
    "session_stats",
    "sessionization",
    "streaming_chunks",
    "streaming_ingest",
    "streaming_minhash_dedup",
    "streaming_scd2",
    "streaming_sessions",
    "streaming_window_stats",
    # final slot: first green-r8 exhausted rotation by name tiebreak
    "asof_last_error",
)

#: Names that MUST sit inside the driver's 50-entry window this round:
#: every query that has never received a driver row, every query whose
#: implementation changed since its last green row, and every query at
#: the exhausted ≤-3-round deferral limit. Enforced by
#: tools/driver_sweep.py and tests/test_plan_quality.py so a rotation can
#: never silently strand a debut (r6 verdict, marching order 5).
#:
#: r11 catch-up round: the ENTIRE window is non-negotiable — 2 debuts +
#: 1 changed + 47 exhausted fill all 50 slots (see the staged catch-up
#: amendment above WINDOW_HEAD); the remaining 48 exhausted green-r8
#: rotations carry to r12 with the committed SWEEP_SF001/SF01_r11 sweeps as compensating
#: evidence.
MUST_VERIFY: tuple[str, ...] = WINDOW_HEAD

#: r12 DEBUT QUEUE — empty: both outstanding debuts
#: (doc_tokenizer_fidelity — the r10 dead block, now registered with its
#: oracle per r10 verdict order 2 — and media_pipeline, stranded since
#: r9 by the lost round) hold the first two WINDOW_HEAD slots above.
#: The registry is OVER the 3-round-rotation steady-state capacity
#: (148 ≈ 3×50 − 2) and in staged catch-up; no new queries until the
#: r11+r12 carry debt clears (r10 verdict, marching order 8).
#:
#: Machine-readable; CI cross-checks this against the
#: CORRECTNESS_r0*.json history (every never-driver-verified registry
#: query must be here or in WINDOW_HEAD — tests/test_window_planning.py),
#: and tools/window_planner.py consumes it to COMPUTE the next round's
#: window instead of re-deriving the math by hand.
DEBUT_QUEUE: tuple[str, ...] = ()

#: r12 OWED SET (window math for next round, decided now, not by slip;
#: cross-check with `python tools/window_planner.py` after
#: CORRECTNESS_r11.json lands). The staged catch-up carry: 48 green-r8
#: rotations missed the r11 window (all 50 r11 slots were consumed by
#: older debt) and are pre-committed non-negotiable r12 slots, covered
#: until then by the committed SWEEP_SF001_r11.json / SWEEP_SF01_r11.json
#: sweep artifacts (every carry row green). At r12 they are joined by the 50 green-r9 rotations
#: hitting the 3-round limit → 98 exhausted for 50 slots, so r12 ALSO
#: stages: window = the 48 carried green-r8 + 2 oldest green-r9 (name
#: tiebreak), carrying ~48 green-r9 to r13 with SWEEP_SF01_r12.json as
#: evidence. r13 absorbs that carry within capacity (r11 greens are only
#: 2 rounds stale then) — steady state resumes at r13.
R12_CARRY: tuple[str, ...] = (
    "click_days_no_purchase",
    "daily_active_cumulative",
    "dashboard_summary",
    "dedup_cluster_stats",
    "dedup_hourly_last",
    "dedup_keep_first",
    "doc_cluster_keep",
    "doc_dedup_clusters",
    "doc_dsir_weights",
    "doc_edit_distance",
    "doc_exact_dedup",
    "doc_fingerprints",
    "doc_gopher_rules",
    "doc_mixture_sample",
    "doc_mixture_weights",
    "doc_pii_scan",
    "doc_quality_deciles",
    "doc_simhash",
    "doc_vocab_drift",
    "emb_cosine_topk",
    "emb_hard_negatives",
    "emb_ivfpq_topk",
    "emb_pq_topk",
    "event_cube",
    "event_funnel",
    "event_grouping_sets",
    "media_features",
    "order_priority",
    "part_type_stats",
    "pivot_daily",
    "pricing_summary",
    "region_revenue",
    "retrieval_rrf_ann",
    "revenue_rollup",
    "salted_enrich",
    "salted_rollup",
    "scd2_event_enrich",
    "silence_report",
    "source_overlap",
    "split_leakage_audit",
    "streaming_exact_dedup",
    "supplier_volume",
    "top_customers",
    "top_orders_per_customer",
    "user_day_overlap",
    "user_rolling_stats",
    "value_correlations",
    "value_quantiles",
)


#: The 22 TPC-H plan-shape adaptations (Q1..Q22, in Q order) — bench.py's
#: second calm-timed tier (r8 verdict, marching order 5). The headline
#: 22-query bench set predates this family, so the star-join /
#: decorrelation plans only ever got once-warm TIMINGS numbers; this
#: tier runs them under the same 2-warmup/interleaved-best-of-4 protocol
#: as the headline set, reported beside (never inside) the historical
#: anchor series. Membership is pinned here (each query's docstring
#: carries its Qn citation) and cross-checked by a registry test.
TPCH_SHAPES: tuple[str, ...] = (
    "pricing_summary",            # Q1
    "min_cost_supplier",          # Q2
    "shipping_priority",          # Q3
    "order_priority",             # Q4
    "region_revenue",             # Q5
    "discounted_revenue",         # Q6
    "volume_shipping",            # Q7
    "nation_market_share",        # Q8
    "nation_product_profit",      # Q9
    "top_customers",              # Q10
    "part_concentration",         # Q11
    "late_shipment_priority",     # Q12
    "customer_order_distribution",  # Q13
    "promo_revenue_share",        # Q14
    "top_supplier",               # Q15
    "part_supplier_variety",      # Q16
    "small_qty_revenue",          # Q17
    "large_volume_orders",        # Q18
    "disjunctive_band_revenue",   # Q19
    "excess_volume_suppliers",    # Q20
    "waiting_suppliers",          # Q21
    "idle_rich_customers",        # Q22
)


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
