"""Single registry of named queries + oracle twins.

``__spark_entry__`` and ``bench.py`` both read from here; extension
modules (text_ops, vector_ops, analyst) register by being imported.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_data_pipeline_databricks_spark.plans import relational

QueryFn = Callable[[SparkSession, str], DataFrame]

# The correctness driver hash-checks only the FIRST 50 registry entries
# against their DuckDB oracles, so dict order is load-bearing. The window
# below pins exactly 50 oracle-backed names; families that had no driver
# correctness row through round 2 (stream/analyst/funcs/scale/skew, the
# RANGE-window and binned range-join forms, z-score DQ, vector near-dup,
# multimodal frame-sample) lead the list so they are inside the window
# even if it ever shrinks. Remaining oracle-backed queries follow the
# window (they stay verifiable via tools/check_oracle.py and hold green
# rows in CORRECTNESS_r01/r02); rows-only entries (seeded-hash / sketch
# ops with no SQL twin) always sort last so they never spend a window
# slot on a weaker rows-only check.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- round-5 window. Two goals (round-4 verdict tasks 1+2):
    # (1) the two r4 hash mismatches lead the window so their fixes
    #     (uncast integer SUM -> CAST(... AS BIGINT) in the DuckDB
    #     oracles) are re-verified by the driver itself;
    "text_corpus_report",
    "sample_domain_mixture",
    # (2) the remaining 48 slots rotate in queries that have NEVER held
    #     a driver row (all oracle-green via tools/check_oracle.py,
    #     full-registry sweep re-run this round). Standing rule since
    #     round 2: never-checked beats twice-green; every SURVEY-2
    #     family keeps an in-window anchor (noted per block).
    # TPC-H completion set - all 22 shapes in one driver window
    # (filters P1-P6 via q12/q19/q22 predicates, scalar subqueries
    # P8/J2 via q11/q15/q17/q22, outer/semi/anti joins via q13/q20/q21,
    # aggs A1-A7 via q1-shaped q6/q14/q16, ORDER+LIMIT O1-O4 via q10):
    "join_q2_min_cost_supplier",
    "join_q4_order_priority",
    "join_q5_local_supplier_volume",
    "agg_q6_forecast_revenue",
    "join_q7_volume_shipping",
    "join_q8_market_share",
    "join_q9_product_type_profit",
    "join_q10_returned_items",
    "agg_q11_important_stock",
    "join_q12_priority_shipping",
    "agg_q13_customer_distribution",
    "agg_q14_promo_revenue_pct",
    "join_q15_top_supplier",
    "agg_q16_supplier_part_counts",
    "join_q17_small_quantity_revenue",
    "join_q18_large_volume",
    "join_q19_disjunctive_revenue",
    "join_q20_excess_shipments",
    "join_q21_waiting_suppliers",
    "join_q22_idle_balance",
    # scalar surface (Spark 4 VARIANT + map entries; scalar family
    # anchor, replacing scalar_regexp_extract which is 4x driver-green)
    "scalar_props_variant",
    "scalar_props_map_entries",
    # as-of family (backward form join_asof_orders_quotes is 2x green;
    # the forward and nearest directions have never been checked)
    "join_asof_forward_quotes",
    "join_asof_nearest_quotes",
    # iterative / scale diagnostics
    "graph_part_pagerank",
    "scale_skew_diagnostics",
    # dedup family anchors rotate to the graph-contraction closers
    "dedup_representative_survivors",
    "dedup_component_survivors",
    # samplers (A-ES reservoir now 52-bit-u, temperature mixture's
    # integer SUM now BIGINT-cast - both fixed this round)
    "sample_weighted_reservoir",
    "sample_temperature_mixture",
    # corpus screens
    "text_gopher_rules",
    "text_pii_redaction",
    "text_exact_decontaminate",
    # behavioral analytics
    "events_markov_transitions",
    "events_session_stats",
    "events_ab_test_lift",
    "events_conversion_survival",
    "events_cuped_adjustment",
    # embedding health (both decimal-exact-stddev'd this round)
    "vector_dim_stats",
    "vector_label_cohesion",
    # oracle-checked image kernel (decode->resize, integer oracle)
    "multimodal_image_resize",
    # privacy + warehouse checks (expectation suite is the U1 anchor:
    # a UNION ALL of check streams, same shape as the displaced
    # union_all_check_streams; also the Q1-Q3 gap/jump/stale anchor)
    "quality_k_anonymity",
    "quality_expectation_suite",
    # streaming anchors rotate to the two never-checked stateful forms
    "stream_stream_left_outer_attribution",
    "stream_daily_unique_users",
    # window family anchors (W1-W5 stay covered: native session_window
    # generator, LAG-based gapfill, rolling decimal-exact Bollinger)
    "window_native_session_stats",
    "window_gapfill_daily_close",
    "funcs_bollinger_bands",
    # -- displaced (every one driver-green in r4 or earlier, most 2-4x;
    # family coverage notes above; all stay verifiable via
    # tools/check_oracle.py): the 21 r4 rotation names, the r1-r3
    # anchors agg_pricing_summary / agg_dup_grain_detector /
    # filter_project_revenue / filter_case_classification /
    # filter_scalar_subquery_latest / join_revenue_by_nation /
    # join_range_volatility_expansion / window_supplier_daily_gold /
    # window_latest_snapshot_per_supplier / window_sessionization /
    # sort_topk_orders / union_all_check_streams / scalar_regexp_extract
    # / join_asof_orders_quotes / dedup_exact_survivors /
    # curate_training_corpus / curate_multimodal_corpus /
    # multimodal_frame_sample / vector_near_dup_pairs / analyst_* /
    # funcs_feature_panel / stream_dedup_within_watermark /
    # stream_static_enrich_nation / join_full_outer_reconcile /
    # scale_winsorized_stats / sample_training_shuffle.
    # Round-6 rotation backlog (oracle-backed, never driver-checked
    # after this round): the indicator family funcs_rsi / funcs_macd /
    # funcs_cross_sectional_momentum / funcs_atr_parkinson /
    # funcs_max_drawdown / funcs_vwap_monthly / funcs_weekly_ohlc /
    # funcs_rolling_median_close / funcs_sharpe_sortino /
    # funcs_dow_seasonality, the events tail events_top_paths /
    # events_chi2_independence / events_user_value_deciles /
    # events_interarrival_quantiles / events_rolling_active_users /
    # events_power_users_pareto / events_longest_streak /
    # events_burst_detection, the text tail text_bigram_logprob /
    # text_length_histogram / text_ngram_novelty / text_gopher_survivors
    # / text_zipf_fit, dedup_editdistance_verify /
    # dedup_component_size_histogram, quality_benford_screen /
    # quality_mad_outliers, agg_customer_rfm_segments /
    # join_lateral_top_orders / agg_revenue_share /
    # agg_segment_value_quantiles, and vector_truncation_fidelity —
    # plus the round-5 additions landed after this window was pinned:
    # er_blocked_match_pairs / er_resolved_entities, funcs_cusum_drift,
    # scd2_supplier_history / cdc_supplier_balance_diff /
    # incremental_rollup_equivalence / incremental_cdc_rollup,
    # graph_part_triangles, agg_yoy_revenue_growth,
    # join_interval_overlap, quality_order_total_reconciliation,
    # events_funnel_time_to_convert / events_cumulative_reach,
    # sample_stratified_reservoir, text_lang_confusion_matrix,
    # nested_orders_rollup, source_synthetic_ticks_ohlc and its
    # streaming twin stream_synthetic_ticks_ohlc (the custom Python
    # Data Source, oracle-checked), the sketch-then-verify
    # scale_heavy_hitters, the tolerance-bounded as-of
    # join_asof_tolerance_quotes, the cross-source contamination
    # matrix dedup_cross_source_matrix, the skyline
    # window_pareto_frontier_orders, the BFS traversal
    # graph_part_bfs_hops, the containment decontamination screen
    # dedup_containment_screen, the batch last-touch attribution
    # events_last_touch_attribution, and the linear-interpolation
    # gapfill window_linear_interpolate_close.
)


def _ordered(names, oracle_names):
    """Window names first (in pinned order), then the remaining
    oracle-backed queries, then rows-only queries."""
    window = [n for n in DRIVER_WINDOW if n in names]
    rest = [n for n in names if n not in DRIVER_WINDOW]
    rest_oracle = [n for n in rest if n in oracle_names]
    rest_rows_only = [n for n in rest if n not in oracle_names]
    return window + rest_oracle + rest_rows_only


def _merged():
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    queries.update(relational.QUERIES)
    oracle.update(relational.ORACLE_SQL)
    for mod in _extension_modules():
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE_SQL)
    return queries, oracle


def all_queries() -> dict[str, QueryFn]:
    queries, oracle = _merged()
    return {n: queries[n] for n in _ordered(queries, oracle)}


def all_oracle_sql() -> dict[str, str]:
    queries, oracle = _merged()
    return {n: oracle[n] for n in _ordered(queries, oracle) if n in oracle}


def _extension_modules():
    mods = []
    for name in (
        "relational_ext",
        "breadth_ops",
        "asof_ops",
        "text_ops",
        "vector_ops",
        "analyst",
        "stream_ops",
        "feature_ops",
        "scale_ops",
        "graph_ops",
        "er_ops",
        "warehouse_ops",
    ):
        try:
            mods.append(
                __import__(
                    f"market_data_pipeline_databricks_spark.plans.{name}",
                    fromlist=[name],
                )
            )
        except ImportError:
            continue
    return mods
