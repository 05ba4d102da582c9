"""As-of join queries, oracle-checked against DuckDB's NATIVE
``ASOF JOIN`` — our union+window composition must reproduce a
purpose-built implementation row-for-row.

Shape: orders play trades (key = custkey, time = order date); the
events table plays the quote stream (key = user_id, one deduped
"quote" per user-day, deterministic latest-wins within the day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.asof import (
    asof_join,
    asof_join_forward,
)
from market_data_pipeline_databricks_spark.plans.relational import _events, _t


def _daily_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One quote per (user_id, day): the day's latest event,
    deterministic tie-break on event_id."""
    ev = _events(spark, sf_dir).withColumn("day", F.col("ts").cast("date"))
    w = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("key"),
            "day",
            F.col("value").alias("quote"),
            F.col("event_id").alias("quote_id"),
        )
    )


def join_asof_orders_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each order gets the prevailing quote of its
    customer's event stream at-or-before the order date."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    quotes = _daily_quotes(spark, sf_dir)
    out = asof_join(
        o,
        quotes,
        key="key",
        left_time="odate",
        right_time="day",
        value_cols=["quote", "quote_id"],
    )
    return out.select(
        "o_orderkey",
        F.col("key").alias("custkey"),
        "odate",
        F.col("asof_day").alias("quote_day"),
        F.col("asof_quote").alias("quote"),
        F.col("asof_quote_id").cast("long").alias("quote_id"),
    )


def join_asof_forward_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each order gets the NEXT quote of its customer's
    event stream at-or-after the order date (the settlement/delivery
    direction). Oracle: DuckDB native ASOF with the inequality
    reversed."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    quotes = _daily_quotes(spark, sf_dir)
    out = asof_join_forward(
        o,
        quotes,
        key="key",
        left_time="odate",
        right_time="day",
        value_cols=["quote", "quote_id"],
    )
    return out.select(
        "o_orderkey",
        F.col("key").alias("custkey"),
        "odate",
        F.col("asof_day").alias("quote_day"),
        F.col("asof_quote").alias("quote"),
        F.col("asof_quote_id").cast("long").alias("quote_id"),
    )


QUERIES = {
    "join_asof_orders_quotes": join_asof_orders_quotes,
    "join_asof_forward_quotes": join_asof_forward_quotes,
}

ORACLE_SQL = {
    "join_asof_orders_quotes": """
        WITH quotes AS (
          SELECT user_id AS key, day, quote, quote_id FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, value AS quote,
                   event_id AS quote_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1
        )
        SELECT o_orderkey, o_custkey AS custkey,
               CAST(o_orderdate AS DATE) AS odate,
               q.day AS quote_day, q.quote AS quote,
               CAST(q.quote_id AS BIGINT) AS quote_id
        FROM orders
        ASOF LEFT JOIN quotes q
          ON o_custkey = q.key AND q.day <= CAST(o_orderdate AS DATE)
    """,
    "join_asof_forward_quotes": """
        WITH quotes AS (
          SELECT user_id AS key, day, quote, quote_id FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, value AS quote,
                   event_id AS quote_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1
        )
        SELECT o_orderkey, o_custkey AS custkey,
               CAST(o_orderdate AS DATE) AS odate,
               q.day AS quote_day, q.quote AS quote,
               CAST(q.quote_id AS BIGINT) AS quote_id
        FROM orders
        ASOF LEFT JOIN quotes q
          ON o_custkey = q.key AND q.day >= CAST(o_orderdate AS DATE)
    """,
}
