"""Registry ordering invariants.

The correctness driver hash-checks only the FIRST 50 entries of
``queries()`` against ``oracle_sql()``, so dict order is load-bearing:
every window slot must be oracle-backed, and rows-only queries must
never displace a checkable one. Rounds 1–2 lost 29 oracle-backed
queries to this (they sat past position 50); these tests pin the fix.
"""

from __future__ import annotations

from market_data_pipeline_databricks_spark.plans import registry

WINDOW = 50

# The round-12 rotation, as an EXPLICIT literal (not
# list(registry.DRIVER_WINDOW)): the point of this guard is that an
# accidental edit to DRIVER_WINDOW must be mirrored deliberately here —
# aliasing the registry value made the lockstep check trivially true
# (round-6 advice). The 3 new r12 queries lead (partition evolution,
# streaming rank maintenance, streamed evolved commits — a new
# oracle-backed query takes a window slot the round it lands), then the
# stalest-green cohort computed over CORRECTNESS_r01..r11: the 5
# last-green-r05 queries, then the alphabetical head of the r06 cohort
# (42 slots) — see registry.py.
PREVIOUSLY_UNCHECKED = [
    "stream_rank_maintenance",
    "warehouse_partition_evolution",
    "stream_evolved_commits",
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
]


def test_window_literal_lockstep():
    # Both directions: every pinned name is in the registry window and
    # the window contains nothing unpinned.
    assert list(registry.DRIVER_WINDOW) == PREVIOUSLY_UNCHECKED


def test_driver_window_fully_oracle_backed():
    names = list(registry.all_queries())
    oracle = registry.all_oracle_sql()
    window = names[:WINDOW]
    assert all(n in oracle for n in window), [
        n for n in window if n not in oracle
    ]


def test_previously_unchecked_families_in_window():
    window = list(registry.all_queries())[:WINDOW]
    missing = [n for n in PREVIOUSLY_UNCHECKED if n not in window]
    assert not missing, missing


def test_rows_only_queries_sort_last():
    names = list(registry.all_queries())
    oracle = registry.all_oracle_sql()
    flags = [n in oracle for n in names]
    # Once the first rows-only query appears, no oracle-backed query may
    # follow it.
    if False in flags:
        first_rows_only = flags.index(False)
        assert True not in flags[first_rows_only:], names[first_rows_only:]


def test_window_names_exist_and_exact():
    q = registry.all_queries()
    assert len(registry.DRIVER_WINDOW) == WINDOW
    unknown = [n for n in registry.DRIVER_WINDOW if n not in q]
    assert not unknown, unknown


def test_every_query_runnable_signature():
    # Each registry value is a (spark, sf_dir) callable; catch accidental
    # registration of partials/strings at import time.
    for name, fn in registry.all_queries().items():
        assert callable(fn), name
