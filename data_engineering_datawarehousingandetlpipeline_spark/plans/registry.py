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
#: Round-8 window, executing the r7 owed-set math as pre-committed (with
#: the r7 advisor's count correction: the r7 rotation list names 50
#: queries, not 49). Candidates at r8 = 50 green-r6 rotations + 6
#: r7-displaced + 2 exhausted deferrals + 2 r8-queue debuts + 2 r8-new
#: debuts (retrieval_rrf_ann, silence_report) + 2 changed-this-round
#: (scd2_event_enrich, asof_last_error — the as_of_join tiebreak_cols
#: change touches both) = 64 candidates for 50 slots. Resolution: defer
#: exactly 14 multiply-green unchanged queries from the green-r6 fifty to
#: r9 — the advisor-recommended dup_audit / dup_audit_hourly plus the 12
#: deepest-history reference queries (missingness, outliers,
#: filtered_count, max_ts_per_user, watermark_filter, schema_projection,
#: validate_counts, hourly_rollup, json_props, composite_sort,
#: long_term_users, distinct_counts) — all green r1-ish/r2/r3/r4/r6 with
#: implementations unchanged for 5+ rounds and sf0.001 oracle parity in
#: every pytest run (tests/test_oracle_parity.py). This is the same
#: documented ≤-3-round bend as the r7 cleaning-query deferral, and at
#: 112 oracle queries over a 50-slot window it is now the steady state:
#: ~12 queries per round must ride the 3-round cycle; the deepest-history
#: unchanged queries take it. Never defer a debut or a changed query.
WINDOW_HEAD: tuple[str, ...] = (
    # the 2 r7-queue debuts — never driver-verified; slots first, per policy
    "doc_quality_deciles",
    "daily_active_cumulative",
    # r8 debuts (this round's new queries — never driver-verified):
    # ANN-served hybrid retrieval (r7 verdict, marching order 3) and the
    # heartbeat's batch silence twin (marching order 4)
    "retrieval_rrf_ann",
    "silence_report",
    # changed this round: as_of_join grew tiebreak_cols (scd2_event_enrich
    # passes version-first; asof_last_error shares the operator), and
    # doc_quality_deciles above was rebuilt on distributed_ntile
    "scd2_event_enrich",
    "asof_last_error",
    # the 2 r7-deferred cleaning queries — green r1/r2/r3/r4/r5, at the
    # bent ≤-3-round staleness limit, CANNOT defer again (r7 verdict)
    "dedup_keep_first",
    "dedup_hourly_last",
    # the 6 r7-displaced queries (last driver row r5; due now)
    "pricing_summary",
    "doc_exact_dedup",
    "doc_simhash",
    "media_features",
    "doc_fingerprints",
    "emb_cosine_topk",
    # the green-r6 rotation list (50 names in the r7 comment, git history)
    # minus the 14 deferrals documented above — 36 queries, all last
    # verified r6, unchanged since
    "streaming_exact_dedup",
    "emb_ivfpq_topk",
    "emb_pq_topk",
    "doc_mixture_sample",
    "doc_ngram_jaccard",
    "doc_dedup_clusters",
    "doc_pii_scan",
    "event_funnel",
    "doc_mixture_weights",
    "event_grouping_sets",
    "click_days_no_purchase",
    "user_day_overlap",
    "user_rolling_stats",
    "value_correlations",
    "doc_edit_distance",
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
    "value_quantiles",
    "dashboard_summary",
    "emb_hard_negatives",
    "split_leakage_audit",
    "doc_dsir_weights",
    "doc_cluster_keep",
    "dedup_cluster_stats",
    "doc_vocab_drift",
    "source_overlap",
    "salted_enrich",
    "doc_gopher_rules",
)

#: Names that MUST sit inside the driver's 50-entry window this round:
#: every query that has never received a driver row, every query whose
#: implementation changed since its last green row, and every query at
#: the exhausted ≤-3-round deferral limit. Maintained by hand each round
#: alongside WINDOW_HEAD; enforced generically by tools/driver_sweep.py
#: and tests/test_plan_quality.py so a rotation can never silently strand
#: a debut (r6 verdict, marching order 5).
MUST_VERIFY: tuple[str, ...] = (
    # never driver-verified (r7 queue + r8 debuts)
    "doc_quality_deciles",
    "daily_active_cumulative",
    "retrieval_rrf_ann",
    "silence_report",
    # changed this round (as_of_join tiebreak_cols; doc_quality_deciles
    # is above already)
    "scd2_event_enrich",
    "asof_last_error",
    # exhausted deferrals — cannot slip again
    "dedup_keep_first",
    "dedup_hourly_last",
)

#: r9 DEBUT QUEUE — queries implemented after all 50 r8 slots were
#: spoken for (the same late-debut pattern as r6/r7):
#: event_value_percentiles (exact per-group percentiles via
#: operators/ranking.grouped_rank), incremental_star_rollup
#: (incremental join-view maintenance with the in-plan merge proof),
#: event_rolling_anomaly (Hampel-filter trailing median/MAD flags),
#: customer_snapshot_diff (CDC between snapshots via operators/diff),
#: waiting_suppliers (Q21-shaped decorrelated EXISTS/NOT-EXISTS),
#: lineitem_contract (declarative data-contract checks in one scan), and
#: the decorrelation family top_supplier / small_qty_revenue /
#: large_volume_orders / idle_rich_customers (Q15/Q17/Q18/Q22 shapes —
#: oracles state the textbook correlated subqueries, plans run the
#: decorrelated forms), streaming_contract (per-micro-batch
#: expectations monitor, oracle = per-shard recomputation), and the
#: second TPC-H plan-shape batch shipping_priority / promo_revenue_share
#: / disjunctive_band_revenue / nation_market_share (Q3/Q14/Q19/Q8 —
#: TakeOrdered top-k, one-pass conditional-sum ratio, OR-of-ANDs
#: residual join with pushed supersets, share-of-total without a
#: self-join), native_session_window (built-in session_window aggregate
#: beside the lag and stateful variants), and warehouse_skipping_scan
#: (file-level data-skipping manifest read with in-construction pruning
#: assertion), streaming_attribution (watermarked stream-stream interval
#: join — click→purchase attribution within a 1 h horizon, cross-batch
#: match + left-outer watermark-emission pytests, oracle = the batch
#: self-join), and warehouse_time_travel (read_as_of through
#: merge_replace + delete_where rewrites via the retained-hardlink
#: mirror — the Delta VERSION AS OF analogue, erasure driver-verified;
#: oracle = the plain source slice), and the third TPC-H plan-shape
#: batch volume_shipping / customer_order_distribution /
#: min_cost_supplier / nation_product_profit (Q7/Q13/Q2/Q9 shapes — one
#: dimension in two broadcast roles with the pair disjunction as a join
#: residual, outer-join-preserving zero-bucket histogram, correlated-MIN
#: oracle decorrelated to a min(struct) argmin over a semi-join-pruned
#: fact scan, and name-filtered-dim fact pruning; each plan-gated), and
#: warehouse_change_feed (version-to-version CDF — the Delta
#: table_changes analogue composing read_as_of with the relational
#: snapshot diff; insert/update/delete classification pytest-pinned,
#: oracle derives the applied mutations from the source), and
#: streaming_enrich (stream-static broadcast dimension enrichment —
#: stateless, shuffle-free, left-outer NULL survival pytest-pinned;
#: oracle = the plain batch join), plus two more decorrelation shapes:
#: part_concentration (Q11 HAVING-over-global-total — pinned per-part
#: aggregate feeds both the broadcast total and the threshold) and
#: part_supplier_variety (Q16 NOT IN blacklist — broadcast LEFT ANTI
#: pruning before the distinct count, non-nullable-key caveat
#: documented), sliding_window_stats (overlapping F.window(1 h every
#: 15 min) — ONE 4-way Expand into one aggregate, plan-gated; oracle =
#: the constant k∈0..3 grid join), and json_props_variant (the same
#: extraction as json_props through Spark 4's VARIANT type — parse once,
#: typed try_variant_get; oracle identical by design), and
#: referral_rollup (hierarchy rollup via Spark 4's native recursive CTE
#: — UnionLoop with column pruning reaching inside the loop body; oracle
#: = DuckDB's native WITH RECURSIVE over the identical forest), and the
#: final TPC-H plan-shape batch discounted_revenue /
#: late_shipment_priority / excess_volume_suppliers (Q6/Q12/Q20 —
#: pure-pushdown single-scan aggregate, two-sided join residual with
#: both priority counters in one pass, and the deepest nesting in the
#: suite: nested-IN + correlated HAVING decorrelated to a pinned
#: aggregate-of-aggregate; with these, ALL 22 TPC-H query shapes have
#: registered adaptations), and referral_pagerank (iterative fixed-point
#: opened as a family beside the recursive CTE: a checkpoint-truncated
#: driver loop of equi-join + dst-keyed aggregate per iteration, with the
#: oracle unrolling the SAME 6 iterations as chained CTEs — decimal
#: anchoring per iteration keeps the engines bit-identical at the fixed
#: point). All local-oracle-verified (sf0.001 pytest parity every CI run
#: + sf0.01 sweep); each MUST take a window slot in r9 (add to
#: MUST_VERIFY when rotating) — 34 debuts total.
#:
#: The debut queue above, machine-readable. CI cross-checks this against
#: the CORRECTNESS_r0*.json history (every never-driver-verified registry
#: query must be here or in WINDOW_HEAD — tests/test_window_planning.py),
#: and tools/window_planner.py consumes it to COMPUTE the next round's
#: window instead of re-deriving the math by hand (the r7 advisor caught
#: an off-by-one in exactly that hand math).
DEBUT_QUEUE: tuple[str, ...] = (
    "customer_order_distribution",
    "customer_snapshot_diff",
    "discounted_revenue",
    "disjunctive_band_revenue",
    "event_rolling_anomaly",
    "event_value_percentiles",
    "excess_volume_suppliers",
    "idle_rich_customers",
    "incremental_star_rollup",
    "json_props_variant",
    "large_volume_orders",
    "late_shipment_priority",
    "lineitem_contract",
    "min_cost_supplier",
    "nation_market_share",
    "nation_product_profit",
    "native_session_window",
    "part_concentration",
    "part_supplier_variety",
    "promo_revenue_share",
    "referral_pagerank",
    "referral_rollup",
    "shipping_priority",
    "sliding_window_stats",
    "small_qty_revenue",
    "streaming_attribution",
    "streaming_contract",
    "streaming_enrich",
    "top_supplier",
    "volume_shipping",
    "waiting_suppliers",
    "warehouse_change_feed",
    "warehouse_skipping_scan",
    "warehouse_time_travel",
)

#: r9 OWED SET (window math for next round, decided now, not by slip):
#: out-of-window at r8 are 62 queries = the 14 deferrals named above
#: (last green r6 — at the bent ≤-3-round limit, CANNOT defer again,
#: they take r9 slots first) + the 48 green-r7 window members that
#: rotated out this round (everything in the r7 WINDOW_HEAD except
#: scd2_event_enrich and asof_last_error, which re-verify in-window now).
#: Owed at r9 = 62 candidates + the 34-query r9 debut queue above for
#: 50 slots.
#: Resolution: the 14 exhausted deferrals and every debut/changed query
#: are non-negotiable (48 slots), leaving 2 for the 48 multiply-green
#: r7 rotations — defer 46 of them, picked at r9 planning time by
#: deepest-green-history-first among queries with every-CI pytest
#: coverage (start with the streaming/second-row family:
#: streaming_window_stats, streaming_sessions, streaming_chunks,
#: streaming_ingest, sessionization, session_stats, doc_ngram_topk,
#: retention_cohorts, doc_span_dedup, emb_quantize_stats,
#: doc_group_sample, emb_cluster_profile — each restart/contract-tested
#: every pytest run — then extend by git-blame age). At 146 registry
#: queries over a 50-slot window the steady-state cycle is ~2.9 rounds;
#: the ≤-3-round staleness policy still holds with the deferral choice
#: rotating, but the registry is now within ~4 queries of the 150-query
#: capacity that policy implies — future additions must earn their slot
#: (the Q6/Q12/Q20 batch closed out the full 22-shape TPC-H sweep and
#: referral_pagerank opened the iterative-fixed-point family; the
#: registry is feature-complete against both yardsticks and any further
#: slot should open a genuinely new operator family).
#: Never defer a debut or a changed query.


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
