"""Structured Streaming tests: CSV stream ingest parity with batch
bronze, watermarked windows vs batch GROUP BY, stateful totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.bronze import normalize_raw
from market_data_pipeline_databricks_spark.sources.csv_prices import read_prices_csv
from market_data_pipeline_databricks_spark.streaming import (
    read_event_stream,
    read_price_csv_stream,
    run_available_now,
    tumbling_daily_counts,
)
from market_data_pipeline_databricks_spark.streaming.stateful import (
    running_user_totals,
)

from tests.conftest import SF_SMALL


def _rows(df, cols):
    # None-safe sort: rows may carry NULL keys (reject-path fixtures)
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_stream_csv_ingest_matches_batch_bronze(spark, raw_dir):
    stream = read_price_csv_stream(spark, str(raw_dir), source="test")
    got = run_available_now(stream, "t_stream_bronze", output_mode="append")
    batch = normalize_raw(read_prices_csv(spark, f"{raw_dir}/*.csv"), source="test")
    cols = ["symbol", "date", "open", "high", "low", "close", "volume"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.filter("symbol = 'EURUSD' AND volume IS NOT NULL").count() == 0


def test_stream_tumbling_equals_batch_groupby(spark):
    ev_stream = read_event_stream(spark, SF_SMALL)
    got = run_available_now(tumbling_daily_counts(ev_stream), "t_tumbling")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    want = (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["day", "event_type", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stateful_totals_equal_batch_aggregate(spark):
    ev_stream = read_event_stream(spark, SF_SMALL)
    got = run_available_now(
        running_user_totals(ev_stream), "t_stateful", output_mode="update"
    )
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    want = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    cols = ["user_id", "n_events"]
    assert _rows(final, cols) == _rows(want, cols)
