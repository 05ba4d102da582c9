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
    # -- round-4 rotation: the 21 oracle-backed queries that have never
    # held a driver-green row (landed after round 3's window was pinned;
    # all pass tools/check_oracle.py locally). They lead the window so
    # that by end of round 4 EVERY oracle-backed query in the repo has
    # held a driver-green row at least once (round-3 verdict task 1).
    "events_funnel",
    "events_retention_cohorts",
    "curate_chunk_corpus",
    "sample_split_leakage",
    "text_bigram_vocab",
    "vector_label_centroids",
    "vector_label_noise_screen",
    "vector_quantize_int8",
    "stream_static_enrich_nation",
    "funcs_market_beta",
    "scale_exact_percentiles",
    "agg_grouping_sets_revenue",
    "unpivot_part_price_bands",
    "text_chunk_overlap",
    "dedup_incremental_batch",
    "text_tfidf_top_terms",
    "sample_source_cap",
    "text_corpus_report",
    "sample_domain_mixture",
    "text_repetition_score",
    "text_unigram_logprob",
    # -- new in round 4 (oracle-green via tools/check_oracle.py); they
    # take the slots of three twice-green anchors whose §2 IDs remain
    # covered in-window: window_latest_snapshot_pruned (P7/W1/W5 via
    # window_latest_snapshot_per_supplier), vector_cosine_topk (vector
    # family via vector_near_dup_pairs + the three vector_* newcomers),
    # text_stats (text family via the six in-window text_* queries;
    # the stats block also feeds the in-window curate capstones).
    # The remaining round-4 newcomers (text_length_histogram,
    # quality_mad_outliers, dedup_component_survivors,
    # join_q4_order_priority, agg_q13_customer_distribution,
    # events_rolling_active_users, dedup_editdistance_verify,
    # agg_revenue_share, window_gapfill_daily_close,
    # sample_temperature_mixture, join_asof_forward_quotes,
    # funcs_rolling_median_close, text_ngram_novelty,
    # events_power_users_pareto, events_longest_streak,
    # events_burst_detection, the TPC-H completion set
    # (join_q5/q7/q8/q10/q12/q15/q17/q18/q19/q21/q22, agg_q6, agg_q14
    # — 17 of 22 TPC-H shapes now oracle-checked), the corpus screens
    # text_gopher_rules + text_pii_redaction, the warehouse
    # quality_expectation_suite, the risk features funcs_max_drawdown
    # + funcs_vwap_monthly + funcs_weekly_ohlc, the behavioral suite
    # events_markov_transitions / events_top_paths /
    # events_chi2_independence / events_ab_test_lift /
    # events_session_stats, the map surface scalar_props_map_entries,
    # the cluster diagnostic dedup_component_size_histogram, and the
    # round-4 continuation batch: the technical-indicator family
    # funcs_bollinger_bands / funcs_rsi / funcs_cross_sectional_momentum
    # / funcs_macd (chained-EWMA grouped map), the value analytics
    # events_user_value_deciles + events_interarrival_quantiles, the
    # bigram LM text_bigram_logprob, the warehouse
    # agg_customer_rfm_segments, the embedding-health pair
    # vector_dim_stats + vector_label_cohesion, the chained-stateful
    # streaming stream_daily_unique_users, the oracle-checked
    # image kernel multimodal_image_resize, the nearest-direction
    # as-of join_asof_nearest_quotes, the LATERAL surface
    # join_lateral_top_orders, the risk ratios funcs_sharpe_sortino +
    # funcs_dow_seasonality, the corpus screens
    # quality_benford_screen + text_zipf_fit, and the TPC-H closers
    # join_q2_min_cost_supplier / join_q9_product_type_profit /
    # agg_q11_important_stock / agg_q16_supplier_part_counts /
    # join_q20_excess_shipments — all 22 TPC-H shapes now
    # oracle-checked — the decimal-exact iterative graph_part_pagerank,
    # the shuffle-key report scale_skew_diagnostics, the
    # centrality-survivor dedup_representative_survivors, the Spark 4
    # VARIANT surface scalar_props_variant, the expiry-pinned
    # stream_stream_left_outer_attribution, the range-risk pair
    # funcs_atr_parkinson, the privacy screen quality_k_anonymity,
    # the exact-k sampler sample_weighted_reservoir, the native
    # generator form window_native_session_stats, the embedding
    # truncation eval vector_truncation_fidelity, the censored
    # survival curve events_conversion_survival, the CUPED readout
    # events_cuped_adjustment, and the rows-only IVF-PQ search
    # vector_ann_ivfpq_topk) are
    # the round-5 rotation backlog —
    # all oracle-green locally via tools/check_oracle.py; they sort
    # directly after the window (oracle-backed before rows-only).
    "join_full_outer_reconcile",
    "scale_winsorized_stats",
    "sample_training_shuffle",
    # -- displaced to make room (same standing rule as rounds 2-3: a
    # never-checked query beats a twice-declared one; every displaced
    # query held a driver-green row in r3 — see CORRECTNESS_r03.json —
    # and its §2/extension IDs stay covered by an in-window anchor):
    #   stream_{tumbling,sliding,session,stateful,click_attribution}
    #     (streaming stays checked via stream_dedup_within_watermark +
    #      stream_static_enrich_nation)
    #   analyst_top_movers_today (J2 via filter_scalar_subquery_latest;
    #     O via sort_topk_orders; math via analyst_threshold_alerts)
    #   analyst_volatility_regime / analyst_liquidity_screen (W3/P9 via
    #     window_supplier_daily_gold / analyst_threshold_alerts)
    #   window_rolling_range_avg + join_range_binned_volatility (J1 via
    #     join_range_volatility_expansion, still in-window)
    #   quality_zscore_outliers (Q1-Q3 via analyst_threshold_alerts +
    #     analyst_completeness)
    #   funcs_log_return_stats / funcs_ewma_close (family via
    #     funcs_feature_panel + funcs_market_beta)
    #   skew_salted_{pricing_summary,join_orders} (A1/join semantics via
    #     agg_pricing_summary / join_revenue_by_nation; salting is a
    #     plan-level technique, result-identical by construction)
    #   text_decontaminate / pack_training_sequences / text_bpe_token_count
    #     (text family via text_stats + the six incoming text queries)
    #   multimodal_wav_roundtrip (multimodal_frame_sample stays)
    #   dedup_components / sample_train_test_split (dedup via
    #     dedup_exact_survivors + dedup_incremental_batch + curate
    #     capstones; sampling via the three incoming sample_* queries)
    # -- round-3-new anchors kept in-window -------------------------------
    "stream_dedup_within_watermark",
    "curate_multimodal_corpus",
    "multimodal_frame_sample",
    "vector_near_dup_pairs",
    "analyst_single_key_recent",
    "analyst_threshold_alerts",
    "analyst_point_in_time",
    "analyst_completeness",
    "analyst_dq_triage_cte",
    "funcs_feature_panel",
    # -- core coverage anchors (driver-green in r1-r3, kept in-window) ----
    "agg_pricing_summary",
    "agg_dup_grain_detector",
    "filter_project_revenue",
    "filter_case_classification",
    "filter_scalar_subquery_latest",
    "join_revenue_by_nation",
    "join_range_volatility_expansion",
    "window_supplier_daily_gold",
    "window_latest_snapshot_per_supplier",
    "window_sessionization",
    "sort_topk_orders",
    "union_all_check_streams",
    "scalar_regexp_extract",
    "join_asof_orders_quotes",
    "dedup_exact_survivors",
    "curate_training_corpus",
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
