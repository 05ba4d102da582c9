"""Round-14 advice fixes on the streaming rank maintenance path:

1. (medium) partition_fmt must come from the explicitly whitelisted
   lexicographically time-monotone family ``yyyy[-MM[-dd[-HH]]]`` —
   the plausible lowercase typo ``yyyy-mm-dd`` (mm = minute-of-hour
   in date_format patterns) passed the old startswith('yyyy') guard
   and produced non-monotone bucket strings, silently mis-pruning the
   order-guard scan and the offsets delta.
2. (low) the offsets cache is stamped with the configuration it was
   computed under (key_col, ts_col, partition_fmt, key dtype); any
   mismatch reads as 'no cache' (full-scan fallback) instead of
   merging stale counts onto the wrong keys.
3. (low) _check_partition_fmt is deterministic: a directory-listing
   structural check over ALL bucket values (a mixed-grain table from
   a crashed run is caught regardless of which row Spark samples)
   plus an aggregated semantic check bounded to the latest bucket.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_fmt_whitelist_rejects_lowercase_and_fragments(spark, tmp_path):
    from market_data_pipeline_databricks_spark.streaming.rank import (
        repair_ranks,
        stream_rank_maintenance,
    )

    df = _mk(spark, [(1, dt.datetime(2025, 1, 1), 7)])
    for bad in ("yyyy-mm-dd", "yyyy-MM-dd HH", "yyyyMMdd", "MM-yyyy"):
        with pytest.raises(ValueError, match="monotone"):
            stream_rank_maintenance(
                df,
                str(tmp_path / "wh"),
                partition_by_month=True,
                partition_fmt=bad,
            )
        with pytest.raises(ValueError, match="monotone"):
            repair_ranks(
                spark,
                df,
                str(tmp_path / "wh"),
                partition_by_month=True,
                partition_fmt=bad,
            )


def test_offsets_cache_stamp_mismatch_reads_as_no_cache(spark, tmp_path):
    from market_data_pipeline_databricks_spark.streaming.rank import (
        _read_offsets_cache,
        _write_offsets_cache,
    )

    wh = str(tmp_path)
    counts = spark.createDataFrame([(7, 3), (9, 1)], "__k long, __n long")
    meta = {
        "__key_col": "user_id",
        "__ts_col": "ts",
        "__pfmt": "yyyy-MM-dd",
        "__ktype": "bigint",
    }
    wm = dt.datetime(2025, 1, 5)
    _write_offsets_cache(spark, counts, wm, wh, "t", meta)
    got, got_wm = _read_offsets_cache(spark, wh, "t", meta)
    assert got_wm == wm
    assert {(r["__k"], r["__n"]) for r in got.collect()} == {(7, 3), (9, 1)}
    # every single-field drift must invalidate (wrong key column, a
    # renamed ts column, a re-grained layout, a retyped key)
    for k, v in [
        ("__key_col", "session_id"),
        ("__ts_col", "event_ts"),
        ("__pfmt", "yyyy-MM"),
        ("__ktype", "string"),
    ]:
        assert _read_offsets_cache(
            spark, wh, "t", {**meta, k: v}
        ) == (None, None)


@pytest.mark.slow
def test_offsets_cache_respects_size_floor(spark, tmp_path):
    """The advisory cache exists to bound reads on LARGE tables; below
    ``offsets_cache_min_bytes`` both its read and its per-batch
    rewrite are skipped (they cost more than the full count they
    replace at that size), with identical final ranks. floor=0 forces
    it on for the tests/drives that assert its lifecycle."""
    from market_data_pipeline_databricks_spark.sources.tables import (
        read_table,
    )
    from market_data_pipeline_databricks_spark.streaming.rank import (
        _offsets_cache_path,
        stream_rank_maintenance,
    )

    t0 = dt.datetime(2025, 1, 1)
    rows = [(i, t0 + dt.timedelta(days=i), 7 + (i % 2)) for i in range(6)]
    ranks = {}
    for floor, expect_cache in ((256 << 20, False), (0, True)):
        wh = str(tmp_path / f"wh_{floor}")
        feed = tmp_path / f"feed_{floor}"
        df = _mk(spark, rows)
        for half in (
            df.filter(F.col("ts") < F.lit(t0 + dt.timedelta(days=3))),
            df.filter(F.col("ts") >= F.lit(t0 + dt.timedelta(days=3))),
        ):
            half.coalesce(1).write.mode("append").parquet(str(feed))
        s = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(feed))
        )
        stream_rank_maintenance(
            s, wh, partition_by_month=True, partition_fmt="yyyy-MM-dd",
            offsets_cache_min_bytes=floor,
        )
        assert _offsets_cache_path(wh, "events_ranked").exists() is (
            expect_cache
        )
        ranks[floor] = {
            r.event_id: r.user_seq
            for r in read_table(spark, wh, "events_ranked").collect()
        }
    assert ranks[0] == ranks[256 << 20]  # cache never changes results


@pytest.mark.slow
def test_mixed_grain_bucket_caught_structurally(spark, tmp_path):
    """A bucket dir left behind at another grain (crashed run) must
    fail the check deterministically — the old single-row sample
    could land on a clean bucket and pass."""
    from market_data_pipeline_databricks_spark.sources.tables import (
        read_table,
    )
    from market_data_pipeline_databricks_spark.streaming.rank import (
        _check_partition_fmt,
        stream_rank_maintenance,
    )

    wh = str(tmp_path / "wh")
    feed = tmp_path / "feed"
    t0 = dt.datetime(2025, 1, 1)
    _mk(
        spark, [(1, t0, 7), (2, t0 + dt.timedelta(days=1), 7)]
    ).coalesce(1).write.parquet(str(feed))
    s = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .parquet(str(feed))
    )
    stream_rank_maintenance(
        s, wh, partition_by_month=True, partition_fmt="yyyy-MM-dd"
    )
    tdir = tmp_path / "wh" / "events_ranked"
    existing = read_table(spark, wh, "events_ranked")
    _check_partition_fmt(existing, "ts", "yyyy-MM-dd", "t", tdir)  # clean
    (tdir / "__p_month=2025-01").mkdir()  # month-grain straggler
    with pytest.raises(ValueError, match="2025-01"):
        _check_partition_fmt(existing, "ts", "yyyy-MM-dd", "t", tdir)


def test_semantic_fmt_mismatch_caught_in_latest_bucket(spark, tmp_path):
    """Same-shape but wrong-derivation buckets (e.g. derived from a
    different timestamp column) are caught by the aggregated check
    over the latest bucket."""
    from market_data_pipeline_databricks_spark.streaming.rank import (
        _check_partition_fmt,
    )

    tdir = tmp_path / "t"
    df = _mk(spark, [(1, dt.datetime(2025, 1, 6), 7)]).withColumn(
        "__p_month", F.lit("2025-01-05")  # shape ok, value wrong
    )
    df.write.partitionBy("__p_month").parquet(str(tdir))
    back = spark.read.parquet(str(tdir))
    with pytest.raises(ValueError, match="disagree"):
        _check_partition_fmt(back, "ts", "yyyy-MM-dd", "t", tdir)


@pytest.mark.slow
def test_null_id_rows_fail_loud_in_sink_and_repair(spark, tmp_path):
    """Row identity is what makes replays detectable and the keyed
    upsert a replace — a NULL id row must be refused by both the
    maintenance sink and repair_ranks, not silently duplicated."""
    from market_data_pipeline_databricks_spark.streaming.rank import (
        RankOrderViolation,
        repair_ranks,
        stream_rank_maintenance,
    )

    df = _mk(
        spark,
        [(None, dt.datetime(2025, 1, 1), 7), (2, dt.datetime(2025, 1, 2), 7)],
    )
    feed = tmp_path / "feed"
    df.coalesce(1).write.parquet(str(feed))
    s = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    with pytest.raises(Exception, match="NULL event_id"):
        stream_rank_maintenance(s, str(tmp_path / "wh"))

    ok = _mk(spark, [(1, dt.datetime(2025, 1, 1), 7)])
    feed2 = tmp_path / "feed2"
    ok.coalesce(1).write.parquet(str(feed2))
    s2 = (
        spark.readStream.schema(ok.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed2))
    )
    stream_rank_maintenance(s2, str(tmp_path / "wh"))
    with pytest.raises(RankOrderViolation, match="NULL event_id"):
        repair_ranks(
            spark,
            _mk(spark, [(None, dt.datetime(2025, 1, 1), 7)]),
            str(tmp_path / "wh"),
        )
