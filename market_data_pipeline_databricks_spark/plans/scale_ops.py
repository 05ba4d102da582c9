"""Scale-path queries: skew mitigation proven result-identical.

Salting changes the shuffle layout, never the answer — so these carry
full DuckDB oracles written as the PLAIN (unsalted) SQL: the salted
plan must hash-match the straightforward aggregation/join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from market_data_pipeline_databricks_spark.plans.relational import _t


def skew_salted_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation by l_returnflag (3 hot keys ≈ the
    worst realistic agg skew: every row is a hot key). Decimal sums
    survive the partial/merge split exactly."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(27,2)").alias("qty_d"),
        F.col("l_extendedprice").cast("decimal(27,2)").alias("price_d"),
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", "qty_d"),
            "sum_price": ("sum", "price_d"),
            "n_rows": ("count", "*"),
            "max_price": ("max", "price_d"),
        },
        n_salt=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_price").cast("double").alias("max_price"),
    )


def skew_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salted join: orders ⋈ customer where two customer keys
    are declared hot — result must equal the plain join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        o.withColumnRenamed("o_custkey", "custkey"),
        c.withColumnRenamed("c_custkey", "custkey"),
        key="custkey",
        hot_keys=[1, 2],
        n_salt=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias(
            "total_price"
        ),
    )


def scale_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts (rsd=0.5%): at 100 TB an exact
    COUNT(DISTINCT) shuffles every distinct value; HLL ships a fixed
    ~KB sketch per group. Rows-only driver check; the rsd error bound
    vs exact is asserted in tests/test_scale_ops.py."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.005).alias("approx_suppliers"),
        F.approx_count_distinct("l_partkey", rsd=0.005).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def scale_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch, accuracy 1e4):
    mergeable fixed-size sketches instead of a global sort. Rows-only
    driver check; error bound vs exact asserted in tests."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_pcts"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


QUERIES = {
    "skew_salted_pricing_summary": skew_salted_pricing_summary,
    "skew_salted_join_orders": skew_salted_join_orders,
    "scale_approx_distinct": scale_approx_distinct,
    "scale_approx_percentiles": scale_approx_percentiles,
}

ORACLE_SQL = {
    "skew_salted_pricing_summary": """
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n_rows,
               CAST(MAX(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "skew_salted_join_orders": """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
}
