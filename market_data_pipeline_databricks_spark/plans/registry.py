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
    # -- round-11 window. The r8-r10 hash-RED rows are now fully
    # diagnosed (VERDICT r10): the driver's value hash canonicalizes
    # DecimalType through a trailing-zero-dropping float-like form on
    # one side only, so ANY final DecimalType (or timestamp_ntz)
    # output column is a hash hazard — NOT the EAGER return plumbing
    # r8/r9 theorized about. Round 11 casts every such final column to
    # DOUBLE/DATE on both the Spark and DuckDB sides (decimals stay
    # internal for exact arithmetic); tools/lint_schemas.py +
    # tests/test_schema_lint.py enforce the rule registry-wide.
    # Standing rule: a converted query must be driver-PROVEN, so the
    # 12 reds stay pinned at the head...
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
    "warehouse_vacuum_audit",
    "scale_global_rank_twopass",
    # ...followed by the 5 other queries the decimal/ntz pass
    # converted this round (3 value-luck greens + the 2 ntz o_orderdate
    # TPC-H shapes the lint surfaced beyond the verdict's list):
    "warehouse_write_audit_publish",
    "warehouse_erase_rtbf",
    "scale_bucketed_join",
    "join_q18_large_volume",
    "join_q3_shipping_priority",
    # -- round-11 additions (never-checked): standing rule — a new
    # oracle-backed query takes a window slot the round it lands
    "scale_salted_window_rank",
    "scale_layout_zorder_pruning",
    # -- stalest-green fill: the alphabetical head of the cohort last
    # green in r05 (computed from CORRECTNESS_r01..r10) — 31 slots.
    "events_session_stats",
    "funcs_bollinger_bands",
    "join_asof_forward_quotes",
    "join_asof_nearest_quotes",
    "join_q10_returned_items",
    "join_q12_priority_shipping",
    "join_q15_top_supplier",
    "join_q17_small_quantity_revenue",
    "join_q19_disjunctive_revenue",
    "join_q20_excess_shipments",
    "join_q21_waiting_suppliers",
    "join_q22_idle_balance",
    "join_q2_min_cost_supplier",
    "join_q4_order_priority",
    "join_q5_local_supplier_volume",
    "join_q7_volume_shipping",
    "join_q8_market_share",
    "multimodal_image_resize",
    "quality_expectation_suite",
    "quality_k_anonymity",
    "sample_domain_mixture",
    "sample_temperature_mixture",
    "sample_weighted_reservoir",
    "scalar_props_map_entries",
    "scalar_props_variant",
    "scale_skew_diagnostics",
    "stream_daily_unique_users",
    "stream_stream_left_outer_attribution",
    "text_corpus_report",
    "text_exact_decontaminate",
    "text_gopher_rules",

    # -- displaced: the r10 window's green tail (all 38 green rows in
    # CORRECTNESS_r10) and the r05-cohort tail from text_pii_redaction
    # on; all remain verifiable via tools/check_oracle.py.
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
