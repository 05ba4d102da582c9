"""Streaming incremental materialized-aggregate maintenance
(streaming/aggregate.py) — the groupBy twin of the rank sink:

- a multi-batch drain equals the batch GROUP BY over the full input
  (counts, sums, per-group watermark);
- a full RE-DRAIN (fresh checkpoint, everything already applied — the
  all-stale replay shape) rewrites identical state;
- CROSS-group mixing (stale groups alongside new groups, the
  partial-crash-replay shape) converges instead of crashing;
- PER-group mixing (a group carrying both stale and fresh rows — late
  data) raises AggOrderViolation BEFORE any write;
- NULL event time fails loud;
- repair_group_aggregates recomputes the listed groups exactly, is
  idempotent, refuses vanished groups, and rewrites only the affected
  group-hash buckets.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.sources.tables import read_table
from market_data_pipeline_databricks_spark.streaming.aggregate import (
    AggOrderViolation,
    repair_group_aggregates,
    stream_agg_maintenance,
)

T0 = dt.datetime(2025, 3, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _rows(n, users=3):
    return [
        (i, T0 + dt.timedelta(hours=i), i % users, float(i) / 4.0)
        for i in range(n)
    ]


def _drain(spark, df, feed, wh, cuts, ckpt=None, n_buckets=4):
    """Write ``df`` into ``feed`` as one file per ts-cut slice and
    drain the whole feed directory through the sink (one micro-batch
    per file via maxFilesPerTrigger)."""
    bounds = [None, *cuts, None]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        part = df
        if lo is not None:
            part = part.filter(F.col("ts") >= F.lit(lo))
        if hi is not None:
            part = part.filter(F.col("ts") < F.lit(hi))
        part.coalesce(1).write.mode("append").parquet(str(feed))
    s = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    stream_agg_maintenance(
        s,
        str(wh),
        sum_cols=["value"],
        checkpoint_dir=str(ckpt) if ckpt else None,
        n_buckets=n_buckets,
    )


def _state(spark, wh):
    return {
        r.user_id: (r["__n"], round(r["__sum_value"], 9), r["__wm"])
        for r in read_table(spark, str(wh), "events_agg").collect()
    }


def _expected(df):
    return {
        r.user_id: (r.n, round(r.s, 9), r.w)
        for r in df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.max("ts").alias("w"),
        )
        .collect()
    }


@pytest.mark.slow
def test_multibatch_drain_equals_batch_groupby(spark, tmp_path):
    df = _mk(spark, _rows(24))
    _drain(
        spark, df, tmp_path / "feed", tmp_path / "wh",
        cuts=[T0 + dt.timedelta(hours=8), T0 + dt.timedelta(hours=16)],
    )
    assert _state(spark, tmp_path / "wh") == _expected(df)


def test_state_layout_is_bucket_partitioned(spark, tmp_path):
    df = _mk(spark, _rows(24, users=6))
    _drain(
        spark, df, tmp_path / "feed", tmp_path / "wh",
        cuts=[], n_buckets=4,
    )
    buckets = {
        p.name
        for p in (tmp_path / "wh" / "events_agg").iterdir()
        if p.is_dir() and p.name.startswith("__p_bucket=")
    }
    assert len(buckets) >= 2  # 6 users hash across >1 of 4 buckets


@pytest.mark.slow
def test_full_redrain_is_idempotent(spark, tmp_path):
    """Fresh checkpoint, same feed: every group re-arrives all-stale —
    the replay shape — and rewrites identical state."""
    df = _mk(spark, _rows(18))
    _drain(
        spark, df, tmp_path / "feed", tmp_path / "wh",
        cuts=[T0 + dt.timedelta(hours=9)], ckpt=tmp_path / "ck1",
    )
    first = _state(spark, tmp_path / "wh")
    s = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "feed"))
    )
    stream_agg_maintenance(
        s, str(tmp_path / "wh"), sum_cols=["value"],
        checkpoint_dir=str(tmp_path / "ck2"), n_buckets=4,
    )
    assert _state(spark, tmp_path / "wh") == first == _expected(df)


def test_cross_group_mix_converges(spark, tmp_path):
    """Stale rows for an applied group alongside new rows for a
    missed group — the partial-crash replay shape — must NOT raise:
    the applied group skips, the missed group applies."""
    applied = _mk(spark, [(0, T0, 10, 1.0), (1, T0 + dt.timedelta(1), 10, 2.0)])
    _drain(spark, applied, tmp_path / "feed", tmp_path / "wh", cuts=[])
    mixed = _mk(
        spark,
        [
            (0, T0, 10, 1.0),  # stale replay of group 10
            (5, T0 + dt.timedelta(2), 20, 7.0),  # new group 20
        ],
    )
    _drain(spark, mixed, tmp_path / "feed2", tmp_path / "wh", cuts=[])
    assert _state(spark, tmp_path / "wh") == {
        10: (2, 3.0, T0 + dt.timedelta(1)),
        20: (1, 7.0, T0 + dt.timedelta(2)),
    }


@pytest.mark.slow
def test_per_group_mix_raises_before_write(spark, tmp_path):
    df = _mk(spark, _rows(12, users=2))
    _drain(spark, df, tmp_path / "feed", tmp_path / "wh", cuts=[])
    tdir = tmp_path / "wh" / "events_agg"
    before = {
        str(p.relative_to(tdir)): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in tdir.rglob("*")
        if p.is_file()
    }
    late_plus_new = _mk(
        spark,
        [
            (2, T0 + dt.timedelta(hours=2), 0, 0.5),  # stale for user 0
            (99, T0 + dt.timedelta(days=9), 0, 9.0),  # fresh for user 0
        ],
    )
    with pytest.raises(Exception, match="repair_group_aggregates"):
        _drain(spark, late_plus_new, tmp_path / "f2", tmp_path / "wh", cuts=[])
    after = {
        str(p.relative_to(tdir)): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in tdir.rglob("*")
        if p.is_file()
    }
    assert after == before  # guard fired before any write


def test_null_event_time_fails_loud(spark, tmp_path):
    df = _mk(spark, [(0, None, 1, 1.0), (1, T0, 1, 2.0)])
    with pytest.raises(Exception, match="NULL"):
        _drain(spark, df, tmp_path / "feed", tmp_path / "wh", cuts=[])


def test_bookkeeping_clash_and_multikey_raise(spark, tmp_path):
    df = _mk(spark, [(0, T0, 1, 1.0)]).withColumn("__n", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        stream_agg_maintenance(df, str(tmp_path), sum_cols=["value"])
    with pytest.raises(ValueError, match="single group column"):
        stream_agg_maintenance(
            _mk(spark, [(0, T0, 1, 1.0)]),
            str(tmp_path),
            group_cols=["user_id", "event_id"],
        )


@pytest.mark.slow
def test_repair_recomputes_exactly_and_is_idempotent(spark, tmp_path):
    full = _mk(spark, _rows(20, users=4))
    late_ids = {5, 9}  # two mid-stream rows of user 1
    on_time = full.filter(~F.col("event_id").isin(list(late_ids)))
    _drain(
        spark, on_time, tmp_path / "feed", tmp_path / "wh",
        cuts=[T0 + dt.timedelta(hours=10)],
    )
    assert _state(spark, tmp_path / "wh") == _expected(on_time)
    for _ in range(2):  # idempotent: second run recomputes identically
        repair_group_aggregates(
            spark,
            full,
            spark.createDataFrame([(1,)], "user_id long"),
            str(tmp_path / "wh"),
            sum_cols=["value"],
            n_buckets=4,
        )
        assert _state(spark, tmp_path / "wh") == _expected(full)


def test_repair_touches_only_affected_buckets(spark, tmp_path):
    full = _mk(spark, _rows(24, users=6))
    on_time = full.filter(F.col("event_id") != 7)  # user 1 short one row
    _drain(spark, on_time, tmp_path / "feed", tmp_path / "wh", cuts=[])
    tdir = tmp_path / "wh" / "events_agg"
    target_bucket = read_table(spark, str(tmp_path / "wh"), "events_agg") \
        .filter(F.col("user_id") == 1).select("__p_bucket").first()[0]
    before = {
        str(p.relative_to(tdir)): p.stat().st_mtime_ns
        for p in tdir.rglob("*.parquet")
        if p.is_file()
    }
    repair_group_aggregates(
        spark, full, spark.createDataFrame([(1,)], "user_id long"),
        str(tmp_path / "wh"), sum_cols=["value"], n_buckets=4,
    )
    after = {
        str(p.relative_to(tdir)): p.stat().st_mtime_ns
        for p in tdir.rglob("*.parquet")
        if p.is_file()
    }
    changed = {
        f.split("/")[0]
        for f in set(before) ^ set(after)
        | {f for f in before.keys() & after.keys() if before[f] != after[f]}
        if f.startswith("__p_bucket=")
    }
    assert changed <= {f"__p_bucket={target_bucket}"}
    assert _state(spark, tmp_path / "wh") == _expected(full)


def test_repair_refuses_vanished_groups(spark, tmp_path):
    df = _mk(spark, _rows(8, users=2))
    _drain(spark, df, tmp_path / "feed", tmp_path / "wh", cuts=[])
    with pytest.raises(ValueError, match="no rows"):
        repair_group_aggregates(
            spark,
            df.filter(F.col("user_id") != 1),  # group 1 has no source rows
            spark.createDataFrame([(1,)], "user_id long"),
            str(tmp_path / "wh"),
            sum_cols=["value"],
            n_buckets=4,
        )


def test_null_group_key_is_a_normal_group(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (0, T0, None, 1.0),
            (1, T0 + dt.timedelta(1), None, 2.5),
            (2, T0, 5, 3.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    # two batches: the NULL group UPDATES through the merge-upsert
    # path in batch 2 — with plain-equality upsert matching the old
    # NULL state row would survive alongside the new one (the
    # null_safe_keys regression this test pins)
    _drain(
        spark, df, tmp_path / "feed", tmp_path / "wh",
        cuts=[T0 + dt.timedelta(hours=12)],
    )
    st = _state(spark, tmp_path / "wh")
    assert st[None] == (2, 3.5, T0 + dt.timedelta(1))
    assert st[5] == (1, 3.0, T0)
    tbl = read_table(spark, str(tmp_path / "wh"), "events_agg")
    assert tbl.count() == 2  # one state ROW per group — no duplicates
    # repair the NULL group too (null-safe joins end to end)
    for _ in range(2):
        repair_group_aggregates(
            spark, df, spark.createDataFrame([(None,)], "user_id long"),
            str(tmp_path / "wh"), sum_cols=["value"], n_buckets=4,
        )
        assert _state(spark, tmp_path / "wh") == st
        assert (
            read_table(spark, str(tmp_path / "wh"), "events_agg").count()
            == 2
        )
