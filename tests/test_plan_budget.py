"""Plan-shape budgets for the headline bench queries: ceilings on
exchange (shuffle/broadcast) and parquet-scan counts in the physical
plan. A regression that doubles the scans or adds a shuffle (like the
round-3 minhash plan bug) fails HERE at sf0.001 instead of only
surfacing as a wall-clock jump in the driver's sf0.1 bench."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_SMALL

# (max exchanges, max parquet scans) — the values the current plans
# produce, asserted as ceilings. Raising a ceiling is a deliberate,
# reviewed act; the comment trail in git explains any change.
BUDGET = {
    "agg_pricing_summary": (1, 1),
    "filter_project_revenue": (0, 1),
    "join_revenue_by_nation": (4, 4),
    "join_range_volatility_expansion": (3, 2),
    "window_supplier_daily_gold": (2, 1),
    "window_latest_snapshot_per_supplier": (2, 1),
    "window_latest_snapshot_pruned": (4, 2),
    "window_sessionization": (1, 1),
    "window_rolling_range_avg": (2, 1),
    "funcs_feature_panel": (2, 1),
    "sort_topk_orders": (0, 1),
    # the TPC-H closers' single-fact-scan discipline (docs/PLANS.md)
    "join_q2_min_cost_supplier": (6, 5),
    "join_q20_excess_shipments": (7, 4),
    "agg_q16_supplier_part_counts": (6, 3),
}


@pytest.mark.parametrize("name", sorted(BUDGET))
def test_plan_within_budget(spark, name):
    fn = entrymod.queries()[name]
    plan = (
        fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    max_ex, max_scan = BUDGET[name]
    assert plan.count("Exchange") <= max_ex, plan
    assert plan.count("Scan parquet") <= max_scan, plan


def test_triangles_fanouts_are_persisted(spark):
    """graph_part_triangles' two multi-consumer frames (edge set ->
    three join legs; triangle list -> three corner projections) must
    stay persisted: without them Catalyst re-executes the
    co-occurrence build per consumer (A/B: 18.6 s -> 7.6 s at sf0.1).
    Persisted frames surface as InMemoryRelation in the plan."""
    fn = entrymod.queries()["graph_part_triangles"]
    plan = (
        fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    assert "InMemoryRelation" in plan, plan
