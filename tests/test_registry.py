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

# The round-5 rotation: the two r4 hash mismatches (oracle integer-SUM
# casts fixed this round — they must hold a green row) plus 48
# oracle-backed queries that have never held a driver correctness row
# (CORRECTNESS_r01-r04 cover 100 of the 180 oracle-backed queries; the
# round-4 additions below are the backlog). Displaced r4-window names
# all hold green rows in CORRECTNESS_r04.json.
PREVIOUSLY_UNCHECKED = [
    "text_corpus_report",
    "sample_domain_mixture",
    "join_q2_min_cost_supplier",
    "join_q4_order_priority",
    "join_q5_local_supplier_volume",
    "agg_q6_forecast_revenue",
    "join_q7_volume_shipping",
    "join_q8_market_share",
    "join_q9_product_type_profit",
    "join_q10_returned_items",
    "agg_q11_important_stock",
    "join_q12_priority_shipping",
    "agg_q13_customer_distribution",
    "agg_q14_promo_revenue_pct",
    "join_q15_top_supplier",
    "agg_q16_supplier_part_counts",
    "join_q17_small_quantity_revenue",
    "join_q18_large_volume",
    "join_q19_disjunctive_revenue",
    "join_q20_excess_shipments",
    "join_q21_waiting_suppliers",
    "join_q22_idle_balance",
    "scalar_props_variant",
    "scalar_props_map_entries",
    "join_asof_forward_quotes",
    "join_asof_nearest_quotes",
    "graph_part_pagerank",
    "scale_skew_diagnostics",
    "dedup_representative_survivors",
    "dedup_component_survivors",
    "sample_weighted_reservoir",
    "sample_temperature_mixture",
    "text_gopher_rules",
    "text_pii_redaction",
    "text_exact_decontaminate",
    "events_markov_transitions",
    "events_session_stats",
    "events_ab_test_lift",
    "events_conversion_survival",
    "events_cuped_adjustment",
    "vector_dim_stats",
    "vector_label_cohesion",
    "multimodal_image_resize",
    "quality_k_anonymity",
    "quality_expectation_suite",
    "stream_stream_left_outer_attribution",
    "stream_daily_unique_users",
    "window_native_session_stats",
    "window_gapfill_daily_close",
    "funcs_bollinger_bands",
]


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
