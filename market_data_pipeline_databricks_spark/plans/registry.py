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
    # -- round-12 window. Rotation per the standing rules (VERDICT
    # r11 task 4): the 19 freshly-proven r11 head slots (12 ex-reds +
    # 5 conversions + 2 r11 debuts) yield; the three NEW round-12
    # oracle-backed queries take debut slots (never-hash-checked beats
    # stalest-green); the remaining 47 slots are the stalest-green
    # cohort computed over CORRECTNESS_r01..r11 — the 5 queries last
    # green in r05 (text_pii_redaction onward), then the alphabetical
    # head of the 48-query r06 cohort (42 slots).
    "stream_rank_maintenance",
    "warehouse_partition_evolution",
    "stream_evolved_commits",
    # -- stalest-green fill: last green r05 (5), then r06 head (42)
    "text_pii_redaction",
    "vector_dim_stats",
    "vector_label_cohesion",
    "window_gapfill_daily_close",
    "window_native_session_stats",
    "agg_yoy_revenue_growth",
    "cdc_supplier_balance_diff",
    "dedup_containment_screen",
    "dedup_cross_source_matrix",
    "er_blocked_match_pairs",
    "events_burst_detection",
    "events_chi2_independence",
    "events_interarrival_quantiles",
    "events_last_touch_attribution",
    "events_longest_streak",
    "events_power_users_pareto",
    "events_rolling_active_users",
    "events_top_paths",
    "events_user_value_deciles",
    "funcs_atr_parkinson",
    "funcs_cross_sectional_momentum",
    "funcs_cusum_drift",
    "funcs_dow_seasonality",
    "funcs_macd",
    "funcs_max_drawdown",
    "funcs_rolling_median_close",
    "funcs_rsi",
    "funcs_sharpe_sortino",
    "funcs_vwap_monthly",
    "funcs_weekly_ohlc",
    "gold_incremental_equivalence",
    "graph_part_bfs_hops",
    "graph_part_triangles",
    "incremental_cdc_rollup",
    "incremental_rollup_equivalence",
    "join_asof_tolerance_quotes",
    "join_interval_overlap",
    "join_lateral_top_orders",
    "nested_orders_rollup",
    "quality_order_total_reconciliation",
    "sample_stratified_reservoir",
    "scale_heavy_hitters",
    "source_synthetic_ticks_ohlc",
    "stream_synthetic_ticks_ohlc",
    "text_bigram_logprob",
    "text_gopher_survivors",
    "text_lang_confusion_matrix",

    # -- displaced: the r11 head (all driver-proven r11) and the r06
    # cohort tail from text_ngram_novelty on; all remain verifiable
    # via tools/check_oracle.py.
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
