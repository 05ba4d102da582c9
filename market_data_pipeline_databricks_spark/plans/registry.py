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
    # -- round-13 window. Rotation per the standing rules: the 50 r12
    # slots are freshly proven and yield; the two NEW round-13
    # oracle-backed queries take debut slots (never-hash-checked beats
    # stalest-green); the remaining 48 slots are the stalest-green
    # cohort computed over CORRECTNESS_r01..r12 — the 6 queries last
    # green in r06 (text_length_histogram onward), then the
    # alphabetical head of the 49-query r07 cohort (42 slots, through
    # text_bpe_encode_stats).
    "stream_rank_repair",
    "warehouse_hidden_partitioning",
    "text_length_histogram",
    "text_ngram_novelty",
    "text_zipf_fit",
    "vector_truncation_fidelity",
    "window_linear_interpolate_close",
    "window_pareto_frontier_orders",
    "agg_customer_rfm_segments",
    "agg_pricing_summary",
    "agg_revenue_share",
    "agg_segment_value_quantiles",
    "analyst_dq_triage_cte",
    "analyst_top_movers_today",
    "curate_chunk_corpus_lsh",
    "curate_multimodal_corpus_lsh",
    "curate_training_corpus",
    "dedup_cdc_duplicate_coverage",
    "dedup_cdc_duplicate_spans",
    "dedup_cdc_incremental",
    "dedup_cdc_repeated_chunks",
    "dedup_component_size_histogram",
    "dedup_components_lsh",
    "dedup_editdistance_verify",
    "dedup_incremental_fuzzy",
    "dedup_incremental_fuzzy_lsh",
    "dedup_method_agreement",
    "dedup_minhash_near",
    "dedup_simhash_near",
    "dedup_winnow_overlap",
    "er_resolved_entities",
    "events_cumulative_reach",
    "events_funnel_time_to_convert",
    "filter_project_revenue",
    "funcs_feature_panel",
    "graph_frequent_itemsets",
    "graph_part_association_rules",
    "graph_part_pagerank",
    "join_asof_orders_quotes",
    "join_q9_product_type_profit",
    "join_range_binned_volatility",
    "quality_benford_screen",
    "quality_mad_outliers",
    "scalar_regexp_extract",
    "scd2_supplier_history",
    "skew_salted_pricing_summary",
    "stream_cdc_incremental",
    "stream_gold_incremental",
    "stream_stateful_user_totals",
    "text_bpe_encode_stats",

    # -- displaced: the r12 window (all driver-proven r12) and the r07
    # cohort tail from text_bpe_train_merges on; all remain verifiable
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
