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


def test_pepper_with_quotes_is_a_literal_not_syntax(spark):
    """Policies are data: a pepper containing quotes/backslashes must
    become a SQL literal, never spliced syntax (injection into the
    security layer)."""
    from market_data_pipeline_databricks_spark.sources.access import (
        _sql_str_literal,
    )

    for pepper in ("it's-secret", "a'||name||'", "back\\slash'y"):
        v = secured_view(
            _base(spark),
            Policy(column_masks={"name": masked_hash("name", pepper)}),
        )
        got = {r.name for r in v.collect()}
        assert all(len(x) == 64 for x in got)  # always a sha2 hex, never raw
        # the literal round-trips exactly through the SQL parser
        lit = spark.sql(f"SELECT {_sql_str_literal(pepper)} AS p").first().p
        assert lit == pepper


def test_masks_see_original_values_order_independent(spark):
    """A mask referencing ANOTHER masked column must see the RAW
    value, regardless of dict insertion order."""
    for order in (("name", "balance"), ("balance", "name")):
        masks = {}
        for c in order:
            masks[c] = (
                masked_hash("name", "p1")
                if c == "name"
                else "balance + length(name)"  # length of RAW name
            )
        v = secured_view(_base(spark), Policy(column_masks=masks))
        r = {x.id: x for x in v.collect()}
        assert r[1].balance == 1234.56 + len("alice"), order


def test_masked_bucket_rejects_nonpositive_width():
    import pytest

    from market_data_pipeline_databricks_spark.sources.access import (
        masked_bucket,
    )

    with pytest.raises(ValueError, match="positive"):
        masked_bucket("c_acctbal", 0)
    with pytest.raises(ValueError, match="positive"):
        masked_bucket("c_acctbal", -100)
