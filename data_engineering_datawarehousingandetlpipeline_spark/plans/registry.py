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
#: Round-10 window, executing the r9 owed-set math as pre-committed and
#: cross-checked by tools/window_planner.py (run with
#: ``--changed incremental_distinct``): the media_pipeline debut takes a
#: slot first (a debut is never deferred) + 1 changed-this-round query
#: (incremental_distinct — the r9 verdict's marching order 1: the false
#: merged==direct HLL equality replaced by the honest
#: both-estimates-within-tolerance mergeability contract, mirrored in
#: the oracle) + the 46 remaining exhausted green-r7 rotations that sat
#: out r8 AND r9 (at the ≤-3-round staleness limit, CANNOT slip again)
#: = 48 non-negotiable slots. The 2 remaining flex slots go
#: deepest-green-first with name tiebreak per the planner:
#: asof_last_error, click_days_no_purchase (both green r8). Everything
#: else green r8/r9 defers — 97 queries, all with every-CI sf0.001
#: oracle parity (tests/test_oracle_parity.py). Never defer a debut or
#: a changed query.
WINDOW_HEAD: tuple[str, ...] = (
    # the r9 DEBUT_QUEUE (never driver-verified; slots first, per policy)
    "media_pipeline",
    # changed this round (r9 verdict, marching order 1): the
    # sketch_merge_exact equality → merged/direct both-within-tolerance
    # contract, oracle mirrored
    "incremental_distinct",
    # the 46 exhausted green-r7 rotations (sat out r8+r9; due now)
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
    # 2 flex slots: deepest-green-first among the green-r8 rotations
    "asof_last_error",
    "click_days_no_purchase",
)

#: Names that MUST sit inside the driver's 50-entry window this round:
#: every query that has never received a driver row, every query whose
#: implementation changed since its last green row, and every query at
#: the exhausted ≤-3-round deferral limit. Maintained by hand each round
#: alongside WINDOW_HEAD; enforced generically by tools/driver_sweep.py
#: and tests/test_plan_quality.py so a rotation can never silently strand
#: a debut (r6 verdict, marching order 5).
MUST_VERIFY: tuple[str, ...] = (
    # never driver-verified: the r9 DEBUT_QUEUE, now in-window
    "media_pipeline",
    # changed this round (merged/direct both-within-tolerance contract,
    # both engines)
    "incremental_distinct",
    # exhausted deferrals — last green r7, cannot slip again
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
)

#: r11 DEBUT QUEUE — empty: the r9 queue's single entry (media_pipeline)
#: took its slot in the r10 window above, and r10 added no new registry
#: surface (the registry sits at the ~150-query capacity of the 3-round
#: rotation policy; the r9 verdict's marching order 6 holds new queries
#: to genuinely new capability only).
#:
#: Machine-readable; CI cross-checks this against the
#: CORRECTNESS_r0*.json history (every never-driver-verified registry
#: query must be here or in WINDOW_HEAD — tests/test_window_planning.py),
#: and tools/window_planner.py consumes it to COMPUTE the next round's
#: window instead of re-deriving the math by hand.
DEBUT_QUEUE: tuple[str, ...] = ()

#: r11 OWED SET (window math for next round, decided now, not by slip;
#: cross-check with `python tools/window_planner.py` after
#: CORRECTNESS_r10.json lands): out-of-window at r10 are 97 queries =
#: the 47 green-r8 rotations that sat out r9 AND r10 (at the ≤-3-round
#: limit by r11 — exhausted, they take slots first) + the 50 green-r9
#: window members that rotated out this round. Owed at r11 = 47
#: exhausted + the (empty) debut queue = 47 non-negotiable slots of 50,
#: leaving 3 flex for the 50 multiply-green r9 rotations,
#: deepest-green-first with name tiebreak. Never defer a debut or a
#: changed query.


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
