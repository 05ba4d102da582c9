"""Regression: the null-safe semi/anti joins must filter even when the
small side DERIVES from the left frame (shared expression IDs). Before
the fresh-alias fix, erase_keys' touched-partition semi-join resolved
to the trivially-true `c <=> c` and kept every partition — a silent
full-table staging rewrite on each partitioned erase."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.sources.writers import (
    _null_safe_anti,
    _null_safe_semi,
)


def test_null_safe_semi_filters_on_self_derived_small(spark):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("p")
    )
    # small derives FROM df — the erase_keys shape
    small = df.filter(F.col("id") < 3).select("p").distinct()  # p in {0,1,2}
    out = _null_safe_semi(df, small, ["p"])
    assert out.count() == 30  # not 100: the join must actually filter
    anti = _null_safe_anti(df, small, ["p"])
    assert anti.count() == 70


def test_null_safe_semi_matches_null_partitions(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, p string"
    )
    small = df.filter(F.col("id") == 2).select("p")  # the NULL partition
    assert _null_safe_semi(df, small, ["p"]).count() == 2  # both NULLs
    assert _null_safe_anti(df, small, ["p"]).count() == 2


def test_upsert_null_safe_keys_replaces_null_key_rows(spark, tmp_path):
    """Default upsert matching is ANSI MERGE (NULL never matches →
    the NULL-key update INSERTS a second copy); ``null_safe_keys=True``
    is the state-table mode where NULL is a legitimate key and the
    update REPLACES. Both behaviors pinned."""
    from market_data_pipeline_databricks_spark.sources.writers import (
        upsert_by_key,
    )

    schema = "k long, v double"
    base = spark.createDataFrame([(None, 1.0), (7, 2.0)], schema)
    upd = spark.createDataFrame([(None, 9.0)], schema)
    for null_safe, expect_rows in ((False, 3), (True, 2)):
        wh = str(tmp_path / f"wh_{null_safe}")
        upsert_by_key(spark, base, wh, "t", ["k"])
        upsert_by_key(
            spark, upd, wh, "t", ["k"], null_safe_keys=null_safe
        )
        rows = spark.read.parquet(f"{wh}/t").collect()
        assert len(rows) == expect_rows
        if null_safe:
            vals = {r.k: r.v for r in rows}
            assert vals[None] == 9.0 and vals[7] == 2.0
