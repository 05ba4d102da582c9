"""QUALIFY dialect acceptance: the reference's Databricks-SQL analyst
queries (sql/example_queries.sql:7-15,61-72 shapes) run verbatim
through sqlcompat.sql and match the ROW_NUMBER-subquery rewrite."""

from __future__ import annotations

import pytest

from market_data_pipeline_databricks_spark.sqlcompat import rewrite_qualify, sql

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    from market_data_pipeline_databricks_spark.sources.tables import read_events

    spark.read.parquet(f"{SF_SMALL}/orders.parquet").createOrReplaceTempView("orders")
    read_events(spark, SF_SMALL).createOrReplaceTempView("events")


def _rows(df):
    return sorted(map(tuple, df.collect()), key=str)


def test_qualify_latest_per_group(spark):
    # reference sql/example_queries.sql:7-15 shape, verbatim dialect
    got = sql(
        spark,
        """
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        """,
    )
    want = spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM (
          SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
        ) WHERE rn = 1
        """
    )
    assert _rows(got) == _rows(want)
    assert "__qualify__" not in got.columns


def test_qualify_with_order_and_limit(spark):
    got = sql(
        spark,
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC) = 1
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 5
        """,
    )
    rows = got.collect()
    assert len(rows) == 5
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_qualify_with_cte(spark):
    got = sql(
        spark,
        """
        WITH big AS (SELECT * FROM orders WHERE o_totalprice > 100000)
        SELECT o_custkey, o_orderkey
        FROM big
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey) = 1
        """,
    )
    # one row per customer
    assert got.count() == got.select("o_custkey").distinct().count()


def test_plain_sql_passthrough(spark):
    got = sql(spark, "SELECT COUNT(*) AS n FROM orders")
    assert got.collect()[0].n > 0
    assert rewrite_qualify("SELECT 1")[1] is None


def test_escaped_quote_in_literal_does_not_desync_scanner(spark):
    """A '' escape inside a string literal previously ended the literal
    early, so keywords inside the rest of the string leaked into the
    top-level scan."""
    got = sql(
        spark,
        """
        SELECT o_custkey, o_orderkey, 'don''t QUALIFY me' AS note
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey) = 1
        """,
    )
    assert got.count() == got.select("o_custkey").distinct().count()
    assert got.collect()[0].note == "don't QUALIFY me"


def test_block_comment_containing_keyword_is_ignored(spark):
    got = sql(
        spark,
        """
        SELECT o_custkey, o_orderkey /* not a real QUALIFY or LIMIT */
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey) = 1
        """,
    )
    assert got.count() == got.select("o_custkey").distinct().count()


def test_distinct_guard_sees_past_hints_and_comments(spark):
    import pytest as _pytest

    for stmt in (
        """SELECT /*+ REPARTITION(4) */ DISTINCT o_custkey FROM orders
           QUALIFY ROW_NUMBER() OVER (ORDER BY o_custkey) = 1""",
        """SELECT -- note
           DISTINCT o_custkey FROM orders
           QUALIFY ROW_NUMBER() OVER (ORDER BY o_custkey) = 1""",
    ):
        with _pytest.raises(ValueError, match="DISTINCT"):
            rewrite_qualify(stmt)


def test_ddl_rewrites_using_delta_to_parquet(spark, tmp_path):
    """The reference's verbatim Delta DDL (01_ingest_bronze.py:72-87
    shape) must execute on OSS Spark without delta-spark: USING DELTA
    becomes USING PARQUET, partitioning and inserts work, and quoted
    occurrences of the words are left alone."""
    from market_data_pipeline_databricks_spark.sqlcompat import ddl

    loc = tmp_path / "bronze_prices"
    ddl(
        spark,
        f"""
        CREATE TABLE IF NOT EXISTS bronze_prices_compat (
          symbol STRING,
          date DATE,
          close DOUBLE,
          source STRING COMMENT 'feed USING DELTA upstream'
        )
        USING DELTA
        PARTITIONED BY (symbol)
        LOCATION '{loc}'
        """,
    )
    try:
        # Hive-style DDL reorders partition columns to the end, so
        # positional VALUES would misalign — name the columns.
        spark.sql(
            "INSERT INTO bronze_prices_compat (symbol, date, close, source)"
            " VALUES ('AAA', DATE'2025-01-02', 10.5, 'csv'),"
            " ('BBB', DATE'2025-01-02', 20.0, 'csv')"
        )
        rows = spark.sql(
            "SELECT symbol, close FROM bronze_prices_compat ORDER BY symbol"
        ).collect()
        assert [(r.symbol, r.close) for r in rows] == [
            ("AAA", 10.5),
            ("BBB", 20.0),
        ]
        # physical layout is partitioned by symbol
        assert (loc / "symbol=AAA").exists()
        # the quoted comment survived verbatim
        comment = [
            c
            for c in spark.sql(
                "DESCRIBE TABLE bronze_prices_compat"
            ).collect()
            if c.col_name == "source"
        ][0].comment
        assert comment == "feed USING DELTA upstream"
    finally:
        spark.sql("DROP TABLE IF EXISTS bronze_prices_compat")
