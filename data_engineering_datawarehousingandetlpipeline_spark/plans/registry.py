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
#: Round-12 window, the SECOND staging round of the catch-up forced by
#: the lost round 10 (amendment documented in tools/window_planner.py;
#: r11 verified the 2-debut + 1-changed + 47-oldest-stale head and
#: carried these 48 green-r8 rotations as pre-committed non-negotiable
#: slots — ``R12_CARRY`` below, covered in the interim by the committed
#: SWEEP_SF001_r11.json / SWEEP_SF01_r11.json sweeps). Cross-checked by
#: ``python tools/window_planner.py`` with the r11 history:
#:
#: r12 head = the 48 carried green-r8 rotations (exhausted, 4 rounds
#: stale — the oldest debt) + the 2 oldest green-r9 exhausted names by
#: tiebreak (approx_sketches, composite_sort) = 50. No debuts, no
#: changed queries (registry frozen at 148 until the carry debt clears).
#: The remaining 48 green-r9 rotations carry to r13 (``R13_CARRY``),
#: evidenced by SWEEP_SF01_r12.json; r13 absorbs them within capacity
#: (r11 greens are only 2 rounds stale then) — steady state resumes.
WINDOW_HEAD: tuple[str, ...] = (
    # the 48 green-r8 rotations carried from the r11 window (R12_CARRY)
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
    # the 2 oldest green-r9 exhausted rotations by name tiebreak
    "approx_sketches",
    "composite_sort",
)

#: Names that MUST sit inside the driver's 50-entry window this round:
#: every query that has never received a driver row, every query whose
#: implementation changed since its last green row, and every query at
#: the exhausted ≤-3-round deferral limit. Enforced by
#: tools/driver_sweep.py and tests/test_plan_quality.py so a rotation can
#: never silently strand a debut (r6 verdict, marching order 5).
#:
#: r12 catch-up round: the ENTIRE window is again non-negotiable — the
#: 48 carried green-r8 rotations + 2 exhausted green-r9 fill all 50
#: slots (see the staged catch-up note above WINDOW_HEAD); the remaining
#: 48 exhausted green-r9 rotations carry to r13 (``R13_CARRY``) with the
#: committed SWEEP_SF01_r12.json sweep as compensating evidence.
MUST_VERIFY: tuple[str, ...] = WINDOW_HEAD

#: r12 DEBUT QUEUE — empty: no unverified queries remain (both r11
#: debuts landed green in CORRECTNESS_r11). The registry is OVER the
#: 3-round-rotation steady-state capacity (148 ≈ 3×50 − 2) and in staged
#: catch-up; no new queries until the carry debt clears at r13
#: (r11 verdict, marching order 4).
#:
#: Machine-readable; CI cross-checks this against the
#: CORRECTNESS_r0*.json history (every never-driver-verified registry
#: query must be here or in WINDOW_HEAD — tests/test_window_planning.py),
#: and tools/window_planner.py consumes it to COMPUTE the next round's
#: window instead of re-deriving the math by hand.
DEBUT_QUEUE: tuple[str, ...] = ()

#: r12 OWED SET — ABSORBED: these 48 green-r8 rotations were carried out
#: of the r11 window and now hold the first 48 WINDOW_HEAD slots above
#: (kept as the machine-readable record the r11→r12 rotation test pins;
#: historical once CORRECTNESS_r12 lands).
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

#: r13 OWED SET (window math for next round, decided now, not by slip;
#: cross-check with ``python tools/window_planner.py`` after
#: CORRECTNESS_r12.json lands). The final staging of the r10 catch-up:
#: 48 green-r9 rotations hit the 3-round staleness limit at r12 but the
#: window was consumed by the older green-r8 carry, so they are
#: pre-committed non-negotiable r13 slots, covered in the interim by the
#: committed SWEEP_SF01_r12.json sweep artifact (every carry row green).
#: r13 = these 48 + 2 slots of green-r11 rotations, within capacity —
#: the catch-up ends and steady state resumes.
R13_CARRY: tuple[str, ...] = (
    "customer_order_distribution",
    "customer_snapshot_diff",
    "discounted_revenue",
    "disjunctive_band_revenue",
    "distinct_counts",
    "doc_ngram_jaccard",
    "dup_audit",
    "dup_audit_hourly",
    "event_rolling_anomaly",
    "event_value_percentiles",
    "excess_volume_suppliers",
    "filtered_count",
    "hourly_rollup",
    "idle_rich_customers",
    "incremental_star_rollup",
    "json_props",
    "json_props_variant",
    "large_volume_orders",
    "late_shipment_priority",
    "lineitem_contract",
    "long_term_users",
    "max_ts_per_user",
    "min_cost_supplier",
    "missingness",
    "nation_market_share",
    "nation_product_profit",
    "native_session_window",
    "outliers",
    "part_concentration",
    "part_supplier_variety",
    "promo_revenue_share",
    "referral_pagerank",
    "referral_rollup",
    "schema_projection",
    "shipping_priority",
    "sliding_window_stats",
    "small_qty_revenue",
    "streaming_attribution",
    "streaming_contract",
    "streaming_enrich",
    "top_supplier",
    "validate_counts",
    "volume_shipping",
    "waiting_suppliers",
    "warehouse_change_feed",
    "warehouse_skipping_scan",
    "warehouse_time_travel",
    "watermark_filter",
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
