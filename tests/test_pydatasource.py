"""Spark 4 Python Data Source API: the synthetic-tick source reads
through spark.read.format(...), one partition per symbol, and its
output is the exact pure-function row set regardless of parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.sources.pydatasource import (
    SyntheticTicksDataSource,
    tick_rows,
)


def _read(spark, **opts):
    spark.dataSource.register(SyntheticTicksDataSource)
    r = spark.read.format("synthetic_ticks")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_row_count(spark):
    df = _read(spark, symbols="AAA,BBB", days="3", ticks_per_day="7")
    assert df.columns == ["symbol", "day", "seq", "price", "volume"]
    assert df.count() == 2 * 3 * 7
    assert dict(df.dtypes)["day"] == "date"


def test_rows_match_pure_generator_exactly(spark):
    df = _read(spark, symbols="AAA,BBB", days="2", ticks_per_day="5")
    got = {tuple(r) for r in df.collect()}
    want = {
        t
        for s in ("AAA", "BBB")
        for t in tick_rows(s, 2, 5)
    }
    assert got == want


def test_one_partition_per_symbol(spark):
    df = _read(spark, symbols="AAA,BBB,CCC,DDD", days="1", ticks_per_day="2")
    assert df.rdd.getNumPartitions() == 4


def test_composes_with_engine_operators(spark):
    """The source output feeds the normal engine path: daily OHLC via
    groupBy — no special casing downstream of a custom source."""
    df = _read(spark, symbols="AAA", days="4", ticks_per_day="50")
    daily = df.groupBy("symbol", "day").agg(
        F.min("price").alias("low"),
        F.max("price").alias("high"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    rows = daily.collect()
    assert len(rows) == 4
    assert all(r.n_ticks == 50 and r.low <= r.high for r in rows)


def test_stream_reader_drains_and_matches_batch(spark, tmp_path):
    """readStream over the same source: availableNow drains all days
    in per-day micro-batches and the collected rows equal the batch
    read exactly."""
    spark.dataSource.register(SyntheticTicksDataSource)
    q = (
        spark.readStream.format("synthetic_ticks")
        .option("symbols", "AAA,BBB")
        .option("days", "3")
        .option("ticks_per_day", "4")
        .load()
        .writeStream.format("memory")
        .queryName("synticks")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM synticks").collect()}
    want = {t for s in ("AAA", "BBB") for t in tick_rows(s, 3, 4)}
    assert got == want
