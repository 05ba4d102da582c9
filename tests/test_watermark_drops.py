"""Watermark observability under multi-batch replay of stale data.

Empirically-pinned Spark 4 semantics that operators of a live pipeline
must know (all three surprised us; none match the naive reading of the
docs, which is exactly why they are pinned here):

1. ``dropDuplicates`` with a watermark DOES drop stale replays and
   reports them in ``numRowsDroppedByWatermark`` — but the filter uses
   the watermark as of the PREVIOUS batch boundary, so a replay
   arriving in the very next micro-batch after the watermark advanced
   still passes. Alerting should therefore treat the metric as
   eventually-consistent, not per-batch-exact.
2. Append-mode window AGGREGATION does not drop late input at all: a
   behind-the-watermark row forms its (already-closed) window, which
   emits immediately. Duplicated late replays produce duplicate window
   rows downstream — the reason the repo's streaming MERGE sink
   upserts on the window key instead of blindly appending
   (streaming/ingest.py:stream_upsert_to_table).
"""

from __future__ import annotations

import pytest

import datetime as dt
import os
import tempfile
import time

from pyspark.sql import functions as F

T0 = dt.datetime(2026, 1, 10, 12, 0, 0)
LATE = T0 - dt.timedelta(days=3)


def _write_batches(spark):
    """Four files, mtime-ordered so maxFilesPerTrigger=1 processes them
    as separate micro-batches: fresh / fresh+late / fresher / late."""
    src = tempfile.mkdtemp(prefix="wm_src_")

    def w(rows, name):
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src, name))

    w([(T0, 1), (T0, 2)], "b1")
    time.sleep(1.1)
    w([(T0, 3), (LATE, 4), (LATE, 5)], "b2")
    time.sleep(1.1)
    w([(T0 + dt.timedelta(days=2), 6)], "b3")
    time.sleep(1.1)
    w([(LATE, 7), (LATE, 8)], "b4")
    return src


def _run(spark, df, name):
    ckpt = tempfile.mkdtemp(prefix=f"wm_ckpt_{name}_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    return dropped, n_batches


def _stream(spark, src):
    return (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )


@pytest.mark.slow
def test_dedup_drops_late_rows_one_batch_behind_the_watermark(spark):
    src = _write_batches(spark)
    dedup = (
        _stream(spark, src)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "ts"])
    )
    dropped, n_batches = _run(spark, dedup, "t_wm_dedup")
    assert n_batches >= 4  # the batches really were separate
    # batch-4's stale replay IS dropped and visible in the metric...
    assert dropped == 2
    out = sorted(
        r.user_id for r in spark.sql("SELECT user_id FROM t_wm_dedup").collect()
    )
    # ...but batch-2's replay (immediately after the watermark first
    # advanced) passed through: the filter lags one batch. 7,8 absent.
    assert out == [1, 2, 3, 4, 5, 6]


@pytest.mark.slow
def test_append_aggregation_emits_late_window_instead_of_dropping(spark):
    src = _write_batches(spark)
    agg = (
        _stream(spark, src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day"), "n")
    )
    dropped, n_batches = _run(spark, agg, "t_wm_agg")
    assert n_batches >= 4
    out = {r.day: r.n for r in spark.sql("SELECT * FROM t_wm_agg").collect()}
    # the batch-2 late pair was aggregated into its already-closed
    # window and emitted; the fresh day closed with all three fresh
    # rows; the still-open newest day is absent. The batch-4 replay
    # (two watermark advances behind) was finally dropped — so the
    # late window shows 2, not 4.
    assert out == {
        LATE.replace(hour=0): 2,
        T0.replace(hour=0): 3,
    }
    # the drop metric counts STATE-INPUT rows, after map-side partial
    # aggregation collapsed the two same-window events into one
    assert dropped == 1
