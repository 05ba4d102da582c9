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


def test_verbatim_reference_merge_into(spark, tmp_path):
    """The reference's bronze MERGE (notebooks/bronze/01_ingest_bronze
    .py:93-107) executes VERBATIM through the parquet fallback:
    matched (symbol, date) rows take every source value, unmatched
    insert, untouched rows survive, and re-running the same MERGE is a
    no-op (idempotent upsert)."""
    import datetime as dt

    from market_data_pipeline_databricks_spark import sqlcompat
    from market_data_pipeline_databricks_spark.sources.writers import (
        overwrite_table,
    )

    wh = str(tmp_path)
    cols = (
        "symbol string, date date, open double, high double, low double, "
        "close double, volume long, source string, ingested_at timestamp, "
        "input_file string"
    )
    d1, d2 = dt.date(2025, 1, 1), dt.date(2025, 1, 2)
    t0 = dt.datetime(2025, 1, 3, 0, 0)
    base = spark.createDataFrame(
        [
            ("AAPL", d1, 1.0, 2.0, 0.5, 1.5, 10, "stooq", t0, "f1"),
            ("AAPL", d2, 1.5, 2.5, 1.0, 2.0, 20, "stooq", t0, "f1"),
            ("MSFT", d1, 3.0, 4.0, 2.5, 3.5, 30, "stooq", t0, "f2"),
        ],
        cols,
    )
    overwrite_table(base, wh, "bronze_prices", ["symbol"])

    t1 = dt.datetime(2025, 1, 4, 0, 0)
    incoming = spark.createDataFrame(
        [
            # update: AAPL d2 revised
            ("AAPL", d2, 1.6, 2.6, 1.1, 2.1, 21, "stooq", t1, "f3"),
            # insert: new symbol
            ("GOOG", d1, 9.0, 9.5, 8.5, 9.2, 90, "stooq", t1, "f3"),
        ],
        cols,
    )
    incoming.createOrReplaceTempView("bronze_incoming")

    stmt = """
MERGE INTO bronze_prices AS target
USING bronze_incoming AS source
ON target.symbol = source.symbol AND target.date = source.date
WHEN MATCHED THEN UPDATE SET
  target.open = source.open,
  target.high = source.high,
  target.low = source.low,
  target.close = source.close,
  target.volume = source.volume,
  target.source = source.source,
  target.ingested_at = source.ingested_at,
  target.input_file = source.input_file
WHEN NOT MATCHED THEN INSERT *
"""
    out = sqlcompat.merge(
        spark, stmt, warehouse_dir=wh, partition_cols=["symbol"]
    )
    rows = {(r.symbol, r.date): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[("AAPL", d2)].close == 2.1  # updated
    assert rows[("AAPL", d2)].input_file == "f3"
    assert rows[("AAPL", d1)].close == 1.5  # untouched
    assert rows[("GOOG", d1)].volume == 90  # inserted

    a = sorted(map(tuple, out.collect()), key=lambda t: (t[0], str(t[1])))
    again = sqlcompat.merge(
        spark, stmt, warehouse_dir=wh, partition_cols=["symbol"]
    )
    b = sorted(map(tuple, again.collect()), key=lambda t: (t[0], str(t[1])))
    assert a == b  # idempotent


def test_merge_rejects_unsupported_shapes(spark):
    import pytest

    from market_data_pipeline_databricks_spark import sqlcompat

    with pytest.raises(ValueError, match="unsupported MERGE shape"):
        sqlcompat._parse_merge(
            "MERGE INTO t AS a USING s AS b ON a.k = b.k "
            "WHEN MATCHED THEN DELETE"
        )
    with pytest.raises(ValueError, match="ON clause"):
        sqlcompat._parse_merge(
            "MERGE INTO t AS a USING s AS b ON a.k > b.k "
            "WHEN MATCHED THEN UPDATE SET a.v = b.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_merge_rejects_subset_update_set(spark, tmp_path):
    """A SET list covering only some non-key columns must be rejected:
    the parquet fallback is a whole-row upsert, which would silently
    overwrite the unlisted columns with source values where real Delta
    MERGE keeps the target values."""
    import datetime as dt

    import pytest

    from market_data_pipeline_databricks_spark import sqlcompat
    from market_data_pipeline_databricks_spark.sources.writers import (
        overwrite_table,
    )

    wh = str(tmp_path)
    d1 = dt.date(2025, 1, 1)
    base = spark.createDataFrame(
        [("AAPL", d1, 1.5, 10)], "symbol string, date date, close double, volume long"
    )
    overwrite_table(base, wh, "bronze_sub", ["symbol"])
    spark.createDataFrame(
        [("AAPL", d1, 2.5, 99)], "symbol string, date date, close double, volume long"
    ).createOrReplaceTempView("bronze_sub_incoming")
    stmt = """
MERGE INTO bronze_sub AS target
USING bronze_sub_incoming AS source
ON target.symbol = source.symbol AND target.date = source.date
WHEN MATCHED THEN UPDATE SET target.close = source.close
WHEN NOT MATCHED THEN INSERT *
"""
    with pytest.raises(ValueError, match="every non-key target column"):
        sqlcompat.merge(spark, stmt, warehouse_dir=wh, partition_cols=["symbol"])


# --- nested QUALIFY (round-7: subquery / CTE-body support) ------------------


def test_qualify_inside_subquery(spark):
    got = sql(
        spark,
        """
        SELECT o_custkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice
          FROM orders
          QUALIFY ROW_NUMBER() OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        )
        WHERE o_totalprice > 100000
        """,
    )
    want = spark.sql(
        """
        SELECT o_custkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
          ) WHERE rn = 1
        ) WHERE o_totalprice > 100000
        """
    )
    assert _rows(got) == _rows(want)
    assert all(not c.startswith("__qualify") for c in got.columns)


def test_qualify_inside_cte_body(spark):
    got = sql(
        spark,
        """
        WITH latest AS (
          SELECT o_custkey, o_orderkey, o_totalprice
          FROM orders
          QUALIFY ROW_NUMBER() OVER (
              PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1
        )
        SELECT COUNT(*) AS n, SUM(o_totalprice) AS total FROM latest
        """,
    )
    n_cust = spark.sql("SELECT COUNT(DISTINCT o_custkey) AS n FROM orders").first().n
    assert got.first().n == n_cust


def test_nested_plus_top_level_qualify(spark):
    # inner QUALIFY picks each customer's latest order; outer QUALIFY
    # then keeps the single most expensive of those
    got = sql(
        spark,
        """
        SELECT o_custkey, o_totalprice FROM (
          SELECT o_custkey, o_totalprice
          FROM orders
          QUALIFY ROW_NUMBER() OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        )
        QUALIFY ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_custkey) = 1
        """,
    )
    rows = got.collect()
    assert len(rows) == 1
    assert all(not c.startswith("__qualify") for c in got.columns)


def test_nested_qualify_with_inner_order_limit(spark):
    got = sql(
        spark,
        """
        SELECT AVG(o_totalprice) AS avg_top FROM (
          SELECT o_custkey, o_totalprice
          FROM orders
          QUALIFY ROW_NUMBER() OVER (
              PARTITION BY o_custkey ORDER BY o_totalprice DESC) = 1
          ORDER BY o_totalprice DESC
          LIMIT 10
        )
        """,
    )
    want = spark.sql(
        """
        SELECT AVG(o_totalprice) AS avg_top FROM (
          SELECT o_custkey, o_totalprice FROM (
            SELECT o_custkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS rn
            FROM orders
          ) WHERE rn = 1
          ORDER BY o_totalprice DESC
          LIMIT 10
        )
        """
    )
    assert _rows(got) == _rows(want)


def test_nested_distinct_qualify_rejected(spark):
    with pytest.raises(ValueError, match="DISTINCT"):
        sql(
            spark,
            """
            SELECT * FROM (
              SELECT DISTINCT o_custkey, o_totalprice
              FROM orders
              QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
            )
            """,
        )


def test_qualify_keyword_in_nested_string_untouched(spark):
    got = sql(
        spark,
        """
        SELECT n FROM (
          SELECT COUNT(*) AS n, 'has QUALIFY inside' AS note FROM orders
        )
        """,
    )
    assert got.first().n > 0
