"""Governed views: row-level security + column masking
(sources/access.py). The contract is deny-by-substitution: masked
columns are REPLACED before any consumer logic, so no select/join can
recover a raw value through the view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.sources.access import (
    Policy,
    masked_bucket,
    masked_hash,
    secured_view,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "alice", 1234.56, "EU"), (2, "bob", 999.99, "US"),
         (3, "carol", 2500.00, "EU")],
        "id long, name string, balance double, region string",
    )


def test_row_filter_and_in_place_masks(spark):
    v = secured_view(
        _base(spark),
        Policy(
            row_filter="region = 'EU'",
            column_masks={
                "name": masked_hash("name", "p1"),
                "balance": masked_bucket("balance", 1000),
            },
        ),
    )
    rows = {r.id: r for r in v.collect()}
    assert set(rows) == {1, 3}  # US row invisible
    # masks substituted in place: raw values unreachable via the view
    assert rows[1].name != "alice" and len(rows[1].name) == 64
    assert rows[1].balance == 1000 and rows[3].balance == 2000
    # deterministic pseudonym: same input, same mask (join-stable)
    v2 = secured_view(
        _base(spark), Policy(column_masks={"name": masked_hash("name", "p1")})
    )
    assert {r.name for r in v.collect()} <= {r.name for r in v2.collect()}


def test_mask_cannot_be_selected_around(spark):
    v = secured_view(
        _base(spark), Policy(column_masks={"name": masked_hash("name", "p1")})
    )
    # selecting, filtering, or deriving from the column sees ONLY the
    # masked value — the rewrite happened below every consumer
    derived = v.select(F.upper("name").alias("u")).collect()
    assert all("ALICE" not in r.u and "BOB" not in r.u for r in derived)
    assert v.filter(F.col("name") == "alice").count() == 0


def test_unknown_mask_column_rejected(spark):
    with pytest.raises(ValueError, match="unknown columns"):
        secured_view(_base(spark), Policy(column_masks={"nam": "upper(nam)"}))


def test_row_filter_rides_pushdown(spark, tmp_path):
    """The policy predicate must reach the parquet scan as a pushed
    filter — policy enforcement costs what a WHERE clause costs."""
    p = str(tmp_path / "t")
    _base(spark).write.parquet(p)
    df = spark.read.parquet(p)
    v = secured_view(df, Policy(row_filter="region = 'EU'"))
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(region,EU)" in plan, plan
