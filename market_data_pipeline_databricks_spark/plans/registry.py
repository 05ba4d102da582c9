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
    # -- round-6 window: 50 oracle-backed queries that have NEVER held
    # a driver correctness row (standing rule since round 2:
    # never-checked beats twice-green). 59 backlog names existed at
    # rotation time; the 9 deferred to round 7 are listed below.
    # Family anchors stay in-window throughout (noted per block).
    #
    # technical-indicator family (W2-W4/scalar anchors: LAG chains,
    # rolling frames, RANGE windows, decimal discipline)
    "funcs_rsi",
    "funcs_macd",
    "funcs_cross_sectional_momentum",
    "funcs_atr_parkinson",
    "funcs_max_drawdown",
    "funcs_vwap_monthly",
    "funcs_weekly_ohlc",
    "funcs_rolling_median_close",
    "funcs_sharpe_sortino",
    "funcs_dow_seasonality",
    "funcs_cusum_drift",
    # events tail (A1-A10 anchors: sessionized behavioral aggregates)
    "events_top_paths",
    "events_chi2_independence",
    "events_user_value_deciles",
    "events_interarrival_quantiles",
    "events_rolling_active_users",
    "events_power_users_pareto",
    "events_longest_streak",
    "events_burst_detection",
    "events_last_touch_attribution",
    # text tail (corpus-screen anchors)
    "text_bigram_logprob",
    "text_length_histogram",
    "text_ngram_novelty",
    "text_gopher_survivors",
    "text_zipf_fit",
    "text_lang_confusion_matrix",
    # dedup/decontamination anchors (A8): containment screen + the
    # cross-source contamination matrix
    "dedup_containment_screen",
    "dedup_cross_source_matrix",
    # entity resolution (blocked fuzzy match + transitive identity;
    # banding re-derived on exact integer cents this round)
    "er_blocked_match_pairs",
    "er_resolved_entities",
    # warehouse maintenance: SCD2, CDC diff, mergeable partials,
    # retraction algebra, and the NEW incremental-gold equivalence
    # (round-6 verdict task 3; U1-shaped unions inside)
    "scd2_supplier_history",
    "cdc_supplier_balance_diff",
    "incremental_rollup_equivalence",
    "incremental_cdc_rollup",
    "gold_incremental_equivalence",
    # custom Spark 4 Python Data Source, batch + streaming twins
    "source_synthetic_ticks_ohlc",
    "stream_synthetic_ticks_ohlc",
    # graph closers (iterative anchors beside the r5-green pagerank)
    "graph_part_triangles",
    "graph_part_bfs_hops",
    # scale/sketch ops (eager plan-build count removed this round)
    "scale_heavy_hitters",
    # window/join shape closers: skyline, linear-interp gapfill,
    # tolerance-bounded as-of, interval overlap (J1 anchor), lateral
    # top-k per group (J/O1-O4 anchor)
    "window_pareto_frontier_orders",
    "window_linear_interpolate_close",
    "join_asof_tolerance_quotes",
    "join_interval_overlap",
    "join_lateral_top_orders",
    # aggregates + quality anchors (A/Q): YoY growth, order-total
    # reconciliation (Q1-Q3-shaped check), nested array<struct>
    # round-trip, stratified exact-k reservoir, embedding truncation
    # fidelity (vector-family anchor)
    "agg_yoy_revenue_growth",
    "quality_order_total_reconciliation",
    "nested_orders_rollup",
    "sample_stratified_reservoir",
    "vector_truncation_fidelity",
    # -- deferred to the round-7 window (oracle-backed, never
    # driver-checked, all green via tools/check_oracle.py):
    # agg_customer_rfm_segments / agg_revenue_share /
    # agg_segment_value_quantiles / events_funnel_time_to_convert /
    # events_cumulative_reach / dedup_editdistance_verify /
    # dedup_component_size_histogram / quality_benford_screen /
    # quality_mad_outliers — plus the round-6 additions landed after
    # this window was pinned: stream_gold_incremental (streaming
    # incremental gold maintenance == full recompute), and the two
    # rows-only→oracle upgrades curate_multimodal_corpus_lsh /
    # vector_ann_near_dup_lsh (blocked-GEMM exact structure),
    # dedup_incremental_fuzzy (oracle-backed batch×corpus blocked
    # Jaccard), and text_bpe_train_merges (oracle-replayed BPE merge
    # chain).
    # -- displaced: the full r5 window (all 50 driver-green in
    # CORRECTNESS_r05.json) plus every earlier anchor noted in git
    # history; all stay verifiable via tools/check_oracle.py.
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
