"""Bucketed co-located join: both sides bucketed by the join key →
sort-merge join with zero Exchange in the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.sources.bucketing import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf; managed tables land in the
    # session default and are dropped (data included) at teardown
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b", ["orderkey"], 8, sort_cols=["orderkey"],
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b", ["orderkey"], 8, sort_cols=["orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, on=["orderkey"])
    agg = joined.groupBy().count()  # force a full plan
    assert not plan_has_shuffle(joined), (
        "bucketed equi-join must not shuffle either side"
    )
    # and the result matches the plain (shuffling) join
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert joined.count() == plain.count()


def test_unbucketed_join_does_shuffle(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    # disable broadcast so the contrast is shuffle vs no-shuffle SMJ
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert plan_has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
