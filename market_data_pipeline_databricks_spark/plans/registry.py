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
    # -- round-9 window. Standing rule: never-hash-green beats
    # stalest-green. The 8 queries below are the CORRECTNESS_r08
    # hash-RED rows (rows+schema-green, hash-red — the EAGER
    # localCheckpoint-over-deleted-tempdir returns, VERDICT r8 "What's
    # wrong" #1). Round 9 converted every one to a materialized
    # materialized-rows return (plans/_eager.py) and they lead the window
    # until each holds a full-green driver row (VERDICT r9 task 2).
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    "scale_zorder_clustering",
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    "stream_snapshot_commits",
    "warehouse_snapshot_cdc",
    # -- round-9 additions (never-checked): Ed-Join edit-distance
    # fuzzy dedup (blocked == brute-force oracle) and the dynamic-
    # partition-pruning drive (DPP contract enforced in-query) —
    # displace the two newest r04 tail anchors (sample_split_leakage,
    # sample_training_shuffle)
    "dedup_edit_distance_qgram",
    "scale_dynamic_partition_pruning",
    # round-9 batch 2 (never-checked): streaming-state audit via the
    # Spark 4 statestore reader — displaces sample_source_cap
    "stream_state_store_audit",
    # round-9 batch 3 (never-checked): salted-SHA pseudonymization +
    # k-anonymity audit — displaces multimodal_frame_sample
    "quality_pii_pseudonymize",
    # round-9 batch 4 (never-checked): one-pass declared-constraint
    # validation suite — displaces join_revenue_by_nation
    "quality_constraint_suite",
    # round-9 batch 5 (never-checked): governed view (row-level
    # security + in-place column masks) — displaces
    # join_range_volatility_expansion
    "warehouse_row_level_security",
    # -- stalest-green fill (computed from CORRECTNESS_r01..r08:
    # last green r03 first, then r04, alphabetical within a round;
    # the full r8 window went green in r08 and rotates out).
    # last green in r03:
    "analyst_liquidity_screen",
    "analyst_volatility_regime",
    "dedup_components",
    "funcs_ewma_close",
    "funcs_log_return_stats",
    "multimodal_wav_roundtrip",
    "pack_training_sequences",
    "quality_zscore_outliers",
    "sample_train_test_split",
    "skew_salted_join_orders",
    "stream_session_window_stats",
    "stream_sliding_window_counts",
    "stream_stream_click_attribution",
    "stream_tumbling_daily_counts",
    "text_bpe_token_count",
    "text_decontaminate",
    "text_stats",
    "vector_cosine_topk",
    "window_latest_snapshot_pruned",
    "window_rolling_range_avg",
    # last green in r04 (the 6 round-9 additions above displaced the
    # six newest, so the first 16 alphabetically fill to exactly 50):
    "agg_dup_grain_detector",
    "agg_grouping_sets_revenue",
    "analyst_completeness",
    "analyst_point_in_time",
    "analyst_single_key_recent",
    "analyst_threshold_alerts",
    "curate_chunk_corpus",
    "curate_multimodal_corpus",
    "dedup_exact_survivors",
    "dedup_incremental_batch",
    "events_funnel",
    "events_retention_cohorts",
    "filter_case_classification",
    "filter_scalar_subquery_latest",
    "funcs_market_beta",
    "join_full_outer_reconcile",

    # -- displaced: the full r8 window (42 green in CORRECTNESS_r08;
    # its 8 red rows are re-pinned at the head above) and everything
    # greener than the r04 tail; all remain verifiable via
    # tools/check_oracle.py.
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
