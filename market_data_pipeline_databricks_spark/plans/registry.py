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
    # -- round-10 window. Standing rule: never-hash-green beats
    # stalest-green. The 10 queries below are the union of every
    # CORRECTNESS_r01..r09 row that has NEVER held a full-green driver
    # hash — exactly the construction-time-writing (EAGER) queries
    # (VERDICT r9 "What's wrong" #1). Round 10 converted every one to
    # return a LAZY parquet-rooted oracle-equivalent twin, with the
    # construction semantics enforced by an in-query multiset-equality
    # assertion (plans/_eager.py:checked_lazy) — the returned plan is
    # now indistinguishable from the 252 always-green lazy plans.
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    "scale_zorder_clustering",
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    "stream_snapshot_commits",
    "warehouse_snapshot_cdc",
    "scale_dynamic_partition_pruning",
    "stream_state_store_audit",
    # -- round-10 additions (never-checked): standing rule — a new
    # oracle-backed query takes a window slot the round it lands, so
    # an oracle-parity defect cannot stay driver-invisible
    "warehouse_vacuum_audit",
    "warehouse_write_audit_publish",
    "quality_benford_audit",
    "funcs_pairwise_correlation",
    "scale_global_rank_twopass",
    # -- stalest-green fill (computed from CORRECTNESS_r01..r09):
    # the 24 queries last green in r04 (incl. the anchors the r9
    # additions displaced), then the first 11 alphabetically of the
    # r05 cohort — exactly 50 slots.
    "join_range_volatility_expansion",
    "join_revenue_by_nation",
    "multimodal_frame_sample",
    "sample_source_cap",
    "sample_split_leakage",
    "sample_training_shuffle",
    "scale_exact_percentiles",
    "scale_winsorized_stats",
    "sort_topk_orders",
    "stream_dedup_within_watermark",
    "stream_static_enrich_nation",
    "text_bigram_vocab",
    "text_chunk_overlap",
    "text_repetition_score",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "union_all_check_streams",
    "unpivot_part_price_bands",
    "vector_label_centroids",
    "vector_label_noise_screen",
    "vector_near_dup_pairs",
    "vector_quantize_int8",
    "window_latest_snapshot_per_supplier",
    "window_sessionization",
    # last green in r05:
    "agg_q11_important_stock",
    "agg_q13_customer_distribution",
    "agg_q14_promo_revenue_pct",
    "agg_q16_supplier_part_counts",
    "agg_q6_forecast_revenue",
    "dedup_component_survivors",
    "dedup_representative_survivors",
    "events_ab_test_lift",
    "events_conversion_survival",
    "events_cuped_adjustment",
    "events_markov_transitions",

    # -- displaced: everything greener than the r05 tail (the r9
    # window went green in r09 except its 10 re-pinned reds); all
    # remain verifiable via tools/check_oracle.py.
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
