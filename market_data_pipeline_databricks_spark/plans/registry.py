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
    # -- round-14 window. Rotation per the standing rules: the 50 r13
    # slots are freshly proven and yield; the two NEW round-14
    # oracle-backed queries take debut slots (never-hash-checked
    # beats stalest-green); the remaining 48 slots are the
    # stalest-green cohort computed over CORRECTNESS_r01..r13 — the
    # 7-query r07 cohort tail (text_bpe_train_merges onward), then the
    # 40-query r08 cohort, then the alphabetical head of the r09
    # cohort (1 slot).
    "stream_agg_maintenance",
    "warehouse_composite_spec_pruning",
    "text_bpe_train_merges",
    "text_kneser_ney_bigram",
    "text_tokenizer_fertility",
    "vector_ann_near_dup_lsh",
    "vector_sign_ann_topk",
    "window_dedup_latest_wins",
    "window_supplier_daily_gold",
    "agg_conditional_counts",
    "agg_coverage_report",
    "agg_cube_order_stats",
    "agg_distinct_suppliers",
    "agg_monthly_revenue",
    "agg_rollup_revenue",
    "dedup_lsh_recall_report",
    "dedup_ngram_jaccard",
    "filter_date_interval",
    "filter_greatest_least",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "multimodal_audio_near_dup",
    "multimodal_image_dedup_groups",
    "multimodal_image_dedup_incremental",
    "multimodal_image_near_dup",
    "pivot_qty_by_status",
    "quality_psi_drift",
    "sample_perplexity_mixture",
    "sample_soft_dedup_weights",
    "sample_stratified_events",
    "sample_token_budget_mixture",
    "scalar_json_extract",
    "scalar_string_kitchen",
    "set_except_intersect_buyers",
    "stream_image_dedup_incremental",
    "text_bm25_topk",
    "text_chunk_sliding",
    "text_cross_source_contamination",
    "text_fingerprint_groups",
    "text_lang_id",
    "vector_ann_ivf_fixed_topk",
    "vector_ann_pq_fixed_topk",
    "vector_kmeans_assign",
    "window_gap_detection",
    "window_jump_check",
    "window_latest_event_per_user",
    "window_lead_gap_to_next",
    "window_rank_family",
    "window_stale_check",
    "agg_dup_grain_detector",

    # -- displaced: the r13 window (all driver-proven r13); all remain
    # verifiable via tools/check_oracle.py.
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
