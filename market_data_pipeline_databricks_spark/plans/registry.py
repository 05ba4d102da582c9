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
    # -- round-7 window. Standing rule since round 2: never-checked
    # beats twice-green. This rotation CLOSES the correctness backlog:
    # the 18 oracle-backed queries that had never held a driver
    # correctness row through r06 (pinned in VERDICT r6 task 1) lead,
    # followed by the three round-7 rows-only→oracle upgrades (MinHash /
    # SimHash / winnowing re-expressed over the md5-derived
    # portable_hash60 so the DuckDB oracle REPLAYS the hashing
    # algorithm itself), then 29 family anchors that are already green
    # in r01–r06 — after this round every oracle-backed query in the
    # registry has held ≥1 green driver row.
    #
    # the r6-deferred backlog (segmentation aggs, funnel timing,
    # edit-distance verify, component histogram, DQ screens)
    "agg_customer_rfm_segments",
    "agg_revenue_share",
    "agg_segment_value_quantiles",
    "events_funnel_time_to_convert",
    "events_cumulative_reach",
    "dedup_editdistance_verify",
    "dedup_component_size_histogram",
    "quality_benford_screen",
    "quality_mad_outliers",
    # r6 late additions (landed after the r6 window was pinned)
    "stream_gold_incremental",
    "curate_multimodal_corpus_lsh",
    "vector_ann_near_dup_lsh",
    "dedup_incremental_fuzzy",
    "text_bpe_train_merges",
    "text_bpe_encode_stats",
    "text_kneser_ney_bigram",
    "graph_frequent_itemsets",
    "graph_part_association_rules",
    # round-7 rows-only→oracle upgrades (oracle replays the hashes)
    "dedup_minhash_near",
    "dedup_simhash_near",
    "dedup_winnow_overlap",
    # -- 29 family anchors (all r01–r06 green; one per API family so a
    # regression anywhere in the surface still trips the driver gate):
    # TPC-H/relational core
    "agg_pricing_summary",
    "join_q3_shipping_priority",
    "join_q9_product_type_profit",
    "filter_project_revenue",
    "scalar_regexp_extract",
    # window family
    "window_dedup_latest_wins",
    "window_supplier_daily_gold",
    # join shapes (as-of, binned range)
    "join_asof_orders_quotes",
    "join_range_binned_volatility",
    # analyst + quality
    "analyst_top_movers_today",
    "analyst_dq_triage_cte",
    # streaming (batch-twin-checked)
    "stream_stateful_user_totals",
    # streaming CDC twin (never-checked; the streaming family keeps the
    # stateful anchor plus stream_gold_incremental above)
    "stream_cdc_incremental",
    # round-7 batch-3: content-defined chunking dedup (never-checked
    # beats green anchors — displaces scalar_json_extract and
    # stream_session_window_stats; both families keep other anchors)
    "dedup_cdc_repeated_chunks",
    "dedup_cdc_duplicate_coverage",
    "dedup_cdc_incremental",
    "dedup_cdc_duplicate_spans",
    # technical indicators + skew discipline
    "funcs_feature_panel",
    # tokenizer-fertility report (never-checked; displaces the r5-green
    # quality_zscore_outliers anchor — the DQ family stays covered by
    # the never-checked Benford and MAD screens above)
    "text_tokenizer_fertility",
    "skew_salted_pricing_summary",
    # curation / dedup / vectors / multimodal
    "curate_training_corpus",
    # displaced dedup_components for its never-checked LSH sibling
    # (same family: pairs → components; the LSH form is the 100-TB path)
    "dedup_components_lsh",
    # sign-quantized ANN (never-checked; displaces the r3-green exact
    # cosine anchor — same family, and the sign query carries the exact
    # cosine in its own output)
    "vector_sign_ann_topk",
    # text-vs-embedding dedup reconciliation (never-checked; displaces
    # the r3-green frame-sample anchor — multimodal stays covered by
    # curate_multimodal_corpus_lsh above)
    "dedup_method_agreement",
    # graph (pagerank also carries the r7 bench re-pin task)
    "graph_part_pagerank",
    # entity resolution + warehouse maintenance
    "er_resolved_entities",
    "scd2_supplier_history",
    # events + sampling
    # round-7 batch-2 upgrades (banded-LSH capstones, oracle replays
    # the affine banding) — never-checked beats green anchors, so they
    # displace two events anchors (the events family stays covered by
    # events_funnel_time_to_convert / events_cumulative_reach above)
    "dedup_incremental_fuzzy_lsh",
    "curate_chunk_corpus_lsh",

    # -- displaced: the full r6 window (all 50 driver-green in
    # CORRECTNESS_r06.json) and every earlier window; all remain
    # verifiable via tools/check_oracle.py.
    # -- r8 backlog (oracle-backed, added after this window was full):
    # sample_perplexity_mixture, multimodal_image_near_dup. Rotate
    # them in next round.
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
