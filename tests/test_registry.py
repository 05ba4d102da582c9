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

# The round-13 rotation, as an EXPLICIT literal (not
# list(registry.DRIVER_WINDOW)): the point of this guard is that an
# accidental edit to DRIVER_WINDOW must be mirrored deliberately here —
# aliasing the registry value made the lockstep check trivially true
# (round-6 advice). The 2 new r13 queries lead (streaming rank repair,
# hidden partitioning — a new oracle-backed query takes a window slot
# the round it lands), then the stalest-green cohort computed over
# CORRECTNESS_r01..r12: the 6 last-green-r06 queries, then the
# alphabetical head of the 49-query r07 cohort (42 slots) — see
# registry.py.
PREVIOUSLY_UNCHECKED = [
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
