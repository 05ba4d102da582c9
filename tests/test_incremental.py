"""Incremental rollup maintenance: merging per-partition partial
rollups must equal the full recompute bit-for-bit, in any merge
order/tree shape, including groups that appear in only some
partitions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.incremental import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)

from tests.conftest import SF_SMALL

KEYS = ["l_returnflag", "l_linestatus"]
MEASURES = ["l_extendedprice", "l_quantity"]


def _rows(df):
    return sorted(
        (tuple(str(v) for v in r) for r in df.collect()),
    )


def test_incremental_merge_equals_full_recompute(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    full = finalize_rollup(
        partial_rollup(li, KEYS, MEASURES), KEYS, MEASURES
    )
    # split by ship year — uneven partitions, some groups missing from
    # some years
    years = [r.y for r in li.select(F.year("l_shipdate").alias("y")).distinct().collect()]
    parts = [
        partial_rollup(
            li.filter(F.year("l_shipdate") == y), KEYS, MEASURES
        )
        for y in sorted(years)
    ]
    merged = finalize_rollup(
        merge_rollups(parts, KEYS, MEASURES), KEYS, MEASURES
    )
    assert _rows(merged) == _rows(full)


def test_incremental_merge_is_order_and_shape_independent(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    thirds = [
        partial_rollup(
            li.filter(F.col("l_orderkey") % 3 == i), KEYS, MEASURES
        )
        for i in range(3)
    ]
    flat = merge_rollups(thirds, KEYS, MEASURES)
    # tree shape: (0+1) then +2, in reversed order
    left = merge_rollups([thirds[1], thirds[0]], KEYS, MEASURES)
    tree = merge_rollups([thirds[2], left], KEYS, MEASURES)
    assert _rows(
        finalize_rollup(flat, KEYS, MEASURES)
    ) == _rows(finalize_rollup(tree, KEYS, MEASURES))


def test_incremental_update_touches_only_new_partition(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    old = li.filter(F.year("l_shipdate") < 2000)
    new = li.filter(F.year("l_shipdate") >= 2000)
    state = partial_rollup(old, KEYS, MEASURES)
    # the daily increment: partial over ONLY the new slice, one merge
    updated = merge_rollups(
        [state, partial_rollup(new, KEYS, MEASURES)], KEYS, MEASURES
    )
    want = finalize_rollup(
        partial_rollup(li, KEYS, MEASURES), KEYS, MEASURES
    )
    assert _rows(finalize_rollup(updated, KEYS, MEASURES)) == _rows(want)
    # sanity: both slices are non-trivial so the test means something
    assert old.count() > 0 and new.count() > 0


@pytest.mark.slow
def test_stream_gold_maintenance_out_of_order_batches(spark, tmp_path):
    """A LATE batch (earlier dates arriving after later ones) must
    still converge to the exact full recompute: the cutoff algebra
    recomputes forward from the late batch's min date over the silver
    accumulated so far."""
    import datetime as dt

    from pyspark.sql import functions as F

    from market_data_pipeline_databricks_spark.operators.gold import (
        gold_features,
    )
    from market_data_pipeline_databricks_spark.streaming.ingest import (
        stream_gold_maintenance,
    )

    rows = []
    for sym in ("AAA", "BBB"):
        for i in range(30):
            rows.append(
                (sym, dt.date(2025, 1, 1) + dt.timedelta(days=i),
                 100.0 + i + (7.0 if sym == "BBB" else 0.0), 10 + i, "t")
            )
    cols = "symbol string, date date, close double, volume long, source string"
    silver = spark.createDataFrame(rows, cols)

    feed = str(tmp_path / "feed")
    # chunk 1: days 10-19; chunk 2: days 20-29; chunk 3 (LATE): days 0-9
    d = lambda i: dt.date(2025, 1, 1) + dt.timedelta(days=i)
    for lo, hi in ((10, 20), (20, 30), (0, 10)):
        silver.filter(
            (F.col("date") >= F.lit(d(lo))) & (F.col("date") < F.lit(d(hi)))
        ).coalesce(1).write.mode("append").parquet(feed)

    wh = str(tmp_path / "wh")
    stream = (
        spark.readStream.schema(silver.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    ts = dt.datetime(2026, 1, 1)
    stream_gold_maintenance(stream, wh, computed_at=ts)

    got = sorted(
        map(tuple, spark.read.parquet(f"{wh}/gold_daily")
            .select("symbol", "date", "close", "volume", "return_1d",
                    "vol_20d", "avg_volume_20d").collect())
    )
    want = sorted(
        map(tuple, gold_features(silver, computed_at=ts)
            .select("symbol", "date", "close", "volume", "return_1d",
                    "vol_20d", "avg_volume_20d").collect())
    )
    assert got == want


@pytest.mark.slow
def test_stream_gold_maintenance_replayed_batch_is_idempotent(spark, tmp_path):
    """A re-delivered (duplicate) batch must not corrupt gold: the
    silver accumulation is a keyed upsert, so replays restate the same
    rows instead of appending duplicates that would poison every
    downstream window."""
    import datetime as dt

    from pyspark.sql import functions as F

    from market_data_pipeline_databricks_spark.operators.gold import (
        gold_features,
    )
    from market_data_pipeline_databricks_spark.streaming.ingest import (
        stream_gold_maintenance,
    )

    rows = [
        ("AAA", dt.date(2025, 1, 1) + dt.timedelta(days=i), 100.0 + i, 10 + i, "t")
        for i in range(25)
    ]
    cols = "symbol string, date date, close double, volume long, source string"
    silver = spark.createDataFrame(rows, cols)
    d = lambda i: dt.date(2025, 1, 1) + dt.timedelta(days=i)
    feed = str(tmp_path / "feed")
    chunk1 = silver.filter(F.col("date") < F.lit(d(12)))
    chunk2 = silver.filter(F.col("date") >= F.lit(d(12)))
    chunk1.coalesce(1).write.mode("append").parquet(feed)
    chunk1.coalesce(1).write.mode("append").parquet(feed)  # the replay
    chunk2.coalesce(1).write.mode("append").parquet(feed)

    wh = str(tmp_path / "wh")
    ts = dt.datetime(2026, 1, 1)
    stream = (
        spark.readStream.schema(silver.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    stream_gold_maintenance(stream, wh, computed_at=ts)
    got = sorted(
        map(tuple, spark.read.parquet(f"{wh}/gold_daily")
            .select("symbol", "date", "close", "volume", "return_1d",
                    "vol_20d", "avg_volume_20d").collect())
    )
    want = sorted(
        map(tuple, gold_features(silver, computed_at=ts)
            .select("symbol", "date", "close", "volume", "return_1d",
                    "vol_20d", "avg_volume_20d").collect())
    )
    assert got == want
