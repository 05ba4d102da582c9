"""Incremental rollup maintenance: merging per-partition partial
rollups must equal the full recompute bit-for-bit, in any merge
order/tree shape, including groups that appear in only some
partitions."""

from __future__ import annotations

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
