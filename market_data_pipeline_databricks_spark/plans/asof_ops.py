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


def join_asof_nearest_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each order gets whichever quote is CLOSER in
    time — the prevailing (backward) or the next (forward) — with ties
    resolved backward, the market-data convention (pandas
    merge_asof(direction='nearest') semantics). Composed from the two
    directional as-of passes joined on the order key; a one-sided miss
    falls back to the other side, a two-sided miss yields NULLs.

    Scale: both directional passes are the union+window composition
    (one key exchange each); the final combine is an equi-join on the
    order key. Nearest genuinely needs both passes — no single sorted
    scan resolves it — so 2× the cost of one direction is the honest
    price at any scale."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    quotes = _daily_quotes(spark, sf_dir)
    b = asof_join(
        o, quotes, key="key", left_time="odate", right_time="day",
        value_cols=["quote", "quote_id"],
    ).select(
        "o_orderkey", "key", "odate",
        F.col("asof_day").alias("b_day"),
        F.col("asof_quote").alias("b_quote"),
        F.col("asof_quote_id").alias("b_qid"),
    )
    f = asof_join_forward(
        o, quotes, key="key", left_time="odate", right_time="day",
        value_cols=["quote", "quote_id"],
    ).select(
        "o_orderkey",
        F.col("asof_day").alias("f_day"),
        F.col("asof_quote").alias("f_quote"),
        F.col("asof_quote_id").alias("f_qid"),
    )
    j = b.join(f, "o_orderkey")
    use_b = F.col("f_day").isNull() | (
        F.col("b_day").isNotNull()
        & (
            F.datediff(F.col("odate"), F.col("b_day"))
            <= F.datediff(F.col("f_day"), F.col("odate"))
        )
    )
    pick = lambda bc, fc: F.when(use_b, F.col(bc)).otherwise(F.col(fc))  # noqa: E731
    return j.select(
        "o_orderkey",
        F.col("key").alias("custkey"),
        "odate",
        pick("b_day", "f_day").alias("quote_day"),
        pick("b_quote", "f_quote").alias("quote"),
        pick("b_qid", "f_qid").cast("long").alias("quote_id"),
        F.when(F.col("b_day").isNull() & F.col("f_day").isNull(), F.lit(None).cast("string"))
        .when(use_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


QUERIES = {
    "join_asof_orders_quotes": join_asof_orders_quotes,
    "join_asof_forward_quotes": join_asof_forward_quotes,
    "join_asof_nearest_quotes": join_asof_nearest_quotes,
}

ORACLE_SQL = {
    # two native ASOF passes (backward + forward) combined with the
    # tie-goes-backward nearest rule — the same composition the Spark
    # side runs, each half individually pinned by the directional
    # oracles above/below
    "join_asof_nearest_quotes": """
        WITH quotes AS (
          SELECT user_id AS key, day, quote, quote_id FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, value AS quote,
                   event_id AS quote_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1
        ),
        o AS (
          SELECT o_orderkey, o_custkey AS key,
                 CAST(o_orderdate AS DATE) AS odate
          FROM orders
        ),
        b AS (
          SELECT o.o_orderkey, o.key, o.odate,
                 q.day AS b_day, q.quote AS b_quote, q.quote_id AS b_qid
          FROM o ASOF LEFT JOIN quotes q
            ON o.key = q.key AND q.day <= o.odate
        ),
        f AS (
          SELECT o.o_orderkey,
                 q.day AS f_day, q.quote AS f_quote, q.quote_id AS f_qid
          FROM o ASOF LEFT JOIN quotes q
            ON o.key = q.key AND q.day >= o.odate
        ),
        j AS (
          SELECT b.*, f.f_day, f.f_quote, f.f_qid,
                 (f_day IS NULL OR (b_day IS NOT NULL
                   AND date_diff('day', b_day, odate)
                       <= date_diff('day', odate, f_day))) AS use_b
          FROM b JOIN f USING (o_orderkey)
        )
        SELECT o_orderkey, key AS custkey, odate,
               CASE WHEN use_b THEN b_day ELSE f_day END AS quote_day,
               CASE WHEN use_b THEN b_quote ELSE f_quote END AS quote,
               CAST(CASE WHEN use_b THEN b_qid ELSE f_qid END AS BIGINT) AS quote_id,
               CASE WHEN b_day IS NULL AND f_day IS NULL THEN NULL
                    WHEN use_b THEN 'backward' ELSE 'forward' END AS direction
        FROM j
    """,
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


def join_asof_tolerance_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of WITH A STALENESS TOLERANCE: the matched quote is
    kept only if it is at most 3 days older than the order — the
    market-data contract behind every "last known price, unless it has
    gone stale" lookup (pandas merge_asof's ``tolerance=``). Composed
    as the plain backward as-of plus a post-filter that NULLs the
    match (left semantics preserved: the order row survives with no
    quote, exactly how merge_asof treats out-of-tolerance matches).
    Oracle: native ASOF LEFT JOIN with the same conditional NULLing —
    DuckDB's ASOF takes no tolerance either, so both engines express
    it identically as match-then-invalidate."""
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
    fresh = F.datediff(F.col("odate"), F.col("asof_day")) <= 3
    return out.select(
        "o_orderkey",
        F.col("key").alias("custkey"),
        "odate",
        F.when(fresh, F.col("asof_day")).alias("quote_day"),
        F.when(fresh, F.col("asof_quote")).alias("quote"),
        F.when(fresh, F.col("asof_quote_id")).cast("long").alias("quote_id"),
        F.coalesce(fresh, F.lit(False)).alias("within_tolerance"),
    )


QUERIES.update({"join_asof_tolerance_quotes": join_asof_tolerance_quotes})

ORACLE_SQL.update(
    {
        "join_asof_tolerance_quotes": """
        WITH quotes AS (
          SELECT user_id AS key, day, quote, quote_id FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, value AS quote,
                   event_id AS quote_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1
        ),
        m AS (
          SELECT o_orderkey, o_custkey AS custkey,
                 CAST(o_orderdate AS DATE) AS odate,
                 q.day AS b_day, q.quote AS b_quote, q.quote_id AS b_qid
          FROM orders
          ASOF LEFT JOIN quotes q
            ON o_custkey = q.key AND q.day <= CAST(o_orderdate AS DATE)
        )
        SELECT o_orderkey, custkey, odate,
               CASE WHEN date_diff('day', b_day, odate) <= 3
                    THEN b_day END AS quote_day,
               CASE WHEN date_diff('day', b_day, odate) <= 3
                    THEN b_quote END AS quote,
               CAST(CASE WHEN date_diff('day', b_day, odate) <= 3
                         THEN b_qid END AS BIGINT) AS quote_id,
               COALESCE(date_diff('day', b_day, odate) <= 3, FALSE)
                 AS within_tolerance
        FROM m
    """,
    }
)
