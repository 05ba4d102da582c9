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
    # -- round-8 window. Standing rule since round 2: never-checked
    # beats twice-green. After the round-7 rotation closed the backlog,
    # the only two oracle-backed queries without a driver row are the
    # post-window r7 additions below — they lead (VERDICT r7 task 1).
    # With the backlog empty the rotation policy degrades gracefully to
    # STALEST-GREEN-FIRST: the remaining slots are exactly the
    # oracle-backed queries whose most recent green driver row is
    # oldest (24 last green in r02, 20 in r03 — computed from
    # CORRECTNESS_r01..r07.json), so every query's last-verified age
    # stays bounded as rounds accumulate. Four round-8 additions
    # displaced the four stale-r04 anchors.
    "sample_perplexity_mixture",
    "multimodal_image_near_dup",
    # round-8 additions (never-checked): oracle-replayed k-means
    # assignment argmin, largest-remainder token-budget allocator,
    # fixed-stride sliding chunker, grouped image dedup — displace the
    # four r04 tail anchors (analyst_point_in_time,
    # analyst_completeness, agg_grouping_sets_revenue,
    # agg_dup_grain_detector); batch-2 additions (incremental image
    # dedup + streaming twin, cross-source contamination matrix)
    # displace the three newest r03 anchors (vector_cosine_topk,
    # window_latest_snapshot_pruned, window_rolling_range_avg)
    "vector_kmeans_assign",
    "sample_token_budget_mixture",
    "text_chunk_sliding",
    "multimodal_image_dedup_groups",
    "multimodal_image_dedup_incremental",
    "stream_image_dedup_incremental",
    "text_cross_source_contamination",
    # batch-4 additions (BM25 retrieval, soft-dedup sampling mass,
    # ORC/JSON sink→source roundtrips) displace the four newest r03
    # anchors (text_stats, text_decontaminate, text_bpe_token_count,
    # stream_tumbling_daily_counts)
    "text_bm25_topk",
    "sample_soft_dedup_weights",
    "source_orc_roundtrip",
    "source_json_roundtrip",
    # batch-5 addition (z-order clustered layout drive) displaces
    # stream_stream_click_attribution (next-stalest r03 anchor)
    "scale_zorder_clustering",
    # batch-6 addition (real-decode audio fingerprint dedup) displaces
    # stream_sliding_window_counts
    "multimodal_audio_near_dup",
    # batch-7 additions (right-to-erasure drive, schema-evolution
    # landing) displace stream_session_window_stats and
    # skew_salted_join_orders
    "warehouse_erase_rtbf",
    "source_schema_evolution",
    # batch-8 additions (snapshot time travel + COW merge, small-file
    # compaction) displace quality_zscore_outliers and
    # sample_train_test_split
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    # batch-9 addition (streaming COW commits == batch merge) displaces
    # pack_training_sequences
    "stream_snapshot_commits",
    # batch-10 addition (oracle-replayed banding-recall evaluation)
    # displaces multimodal_wav_roundtrip
    "dedup_lsh_recall_report",
    # batch-11 addition (fully oracle-replayed fixed-centroid IVF ANN)
    # displaces funcs_log_return_stats
    "vector_ann_ivf_fixed_topk",
    # batch-12 addition (PSI distribution-drift screen) displaces
    # funcs_ewma_close
    "quality_psi_drift",
    # batch-13 addition (change data feed between snapshot versions)
    # displaces dedup_components
    "warehouse_snapshot_cdc",
    # batch-14 addition (shuffle-free bucketed fact join, no-Exchange
    # contract enforced in-query) displaces analyst_volatility_regime
    "scale_bucketed_join",
    # batch-15 addition (fully oracle-replayed fixed-codebook PQ ADC)
    # displaces analyst_liquidity_screen
    "vector_ann_pq_fixed_topk",
    # -- last green in r02
    "agg_conditional_counts",
    "agg_coverage_report",
    "agg_cube_order_stats",
    "agg_distinct_suppliers",
    "agg_monthly_revenue",
    "agg_rollup_revenue",
    "dedup_ngram_jaccard",
    "filter_date_interval",
    "filter_greatest_least",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "pivot_qty_by_status",
    "sample_stratified_events",
    "scalar_json_extract",
    "scalar_string_kitchen",
    "set_except_intersect_buyers",
    "text_fingerprint_groups",
    "text_lang_id",
    "window_gap_detection",
    "window_jump_check",
    "window_latest_event_per_user",
    "window_lead_gap_to_next",
    "window_rank_family",
    "window_stale_check",

    # -- displaced: the full r7 window (all 50 driver-green in
    # CORRECTNESS_r07.json), every earlier window, and (to round-8
    # batch additions) the whole stalest r03/r04 tail; all remain
    # verifiable via tools/check_oracle.py. The window is now 26
    # never-driver-checked round-8 additions + 24 r02-green anchors.
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
