"""Round-12 additions: factored two-pass rank operator + streaming
incremental rank maintenance + partition-evolution registry query.

`two_pass_key_rank` (operators/ranking.py) is the shared core the
global/per-key scale queries now delegate to; `stream_rank_maintenance`
(streaming/rank.py) maintains the per-key rank table incrementally —
O(batch) per micro-batch with offsets counted replay-idempotently from
the maintained table itself.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from market_data_pipeline_databricks_spark.operators.ranking import (
    two_pass_key_rank,
)

SF = "/root/testdata/sf0.001"


def test_two_pass_rank_matches_window_with_and_without_keys(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    got = {
        r.event_id: r.seq
        for r in two_pass_key_rank(
            ev, ["user_id"], [F.asc("ts"), F.asc("event_id")], "seq"
        ).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    truth = {
        r.event_id: r.seq
        for r in ev.withColumn("seq", F.row_number().over(w)).collect()
    }
    assert got == truth
    # keyless (global) form
    got_g = {
        r.event_id: r.seq
        for r in two_pass_key_rank(
            ev, [], [F.asc("ts"), F.asc("event_id")], "seq"
        ).collect()
    }
    wg = Window.orderBy(F.asc("ts"), F.asc("event_id"))
    truth_g = {
        r.event_id: r.seq
        for r in ev.withColumn("seq", F.row_number().over(wg)).collect()
    }
    assert got_g == truth_g


def test_two_pass_rank_rejects_bookkeeping_collisions(spark):
    df = spark.range(5).select(F.col("id"), F.lit(1).alias("pid"))
    with pytest.raises(ValueError, match="collide"):
        two_pass_key_rank(df, [], [F.asc("id")], "r")


def _feed_slices(spark, tmpdir, n_slices=3):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / n_slices
    cuts = [lo + span * i for i in range(1, n_slices)]
    bounds = [None, *cuts, None]
    for i in range(n_slices):
        s = ev
        if bounds[i] is not None:
            s = s.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            s = s.filter(F.col("ts") < F.lit(bounds[i + 1]))
        s.coalesce(1).write.mode("append").parquet(tmpdir)
    return ev


def test_stream_rank_maintenance_equals_batch_window(spark):
    from market_data_pipeline_databricks_spark.sources.tables import read_table
    from market_data_pipeline_databricks_spark.streaming.rank import (
        stream_rank_maintenance,
    )

    feed_dir = tempfile.mkdtemp(prefix="rkfeed_")
    wh = tempfile.mkdtemp(prefix="rkwh_")
    try:
        ev = _feed_slices(spark, feed_dir)
        feed = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(feed_dir)
        )
        stream_rank_maintenance(feed, wh)
        got = {
            r.event_id: r.user_seq
            for r in read_table(spark, wh, "events_ranked").collect()
        }
        w = Window.partitionBy("user_id").orderBy(
            F.asc("ts"), F.asc("event_id")
        )
        truth = {
            r.event_id: r.seq
            for r in ev.withColumn("seq", F.row_number().over(w)).collect()
        }
        assert got == truth
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)


def test_stream_rank_maintenance_replay_is_idempotent(spark):
    """A replayed micro-batch (failure before the checkpoint commit)
    must rewrite the SAME ranks: offsets are counted from the
    maintained table with strict ts < batch-min, so a batch's own
    landed rows never inflate its replayed offsets."""
    from market_data_pipeline_databricks_spark.sources.tables import read_table
    from market_data_pipeline_databricks_spark.streaming.rank import (
        stream_rank_maintenance,
    )

    feed_dir = tempfile.mkdtemp(prefix="rkfeed_")
    wh = tempfile.mkdtemp(prefix="rkwh_")
    ckpt1 = tempfile.mkdtemp(prefix="rkck1_")
    ckpt2 = tempfile.mkdtemp(prefix="rkck2_")
    try:
        ev = _feed_slices(spark, feed_dir)

        def drain(ckpt):
            feed = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(feed_dir)
            )
            stream_rank_maintenance(feed, wh, checkpoint_dir=ckpt)

        drain(ckpt1)
        first = {
            (r.event_id, r.user_seq)
            for r in read_table(spark, wh, "events_ranked").collect()
        }
        # fresh checkpoint over the same feed = every batch replayed
        # against the fully-landed table
        drain(ckpt2)
        second = {
            (r.event_id, r.user_seq)
            for r in read_table(spark, wh, "events_ranked").collect()
        }
        assert first == second
    finally:
        for d in (feed_dir, wh, ckpt1, ckpt2):
            shutil.rmtree(d, ignore_errors=True)


def test_partition_evolution_query_matches_plain_filter(spark):
    out = entrymod.queries()["warehouse_partition_evolution"](spark, SF)
    rows = {r.o_orderstatus: (r.n_rows, r.sum_price) for r in out.collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    truth = {
        r.o_orderstatus: (r.n_rows, r.sum_price)
        for r in orders.filter(F.col("o_custkey").between(100, 400))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(27,2)")
            .cast("double")
            .alias("sum_price"),
        )
        .collect()
    }
    assert rows == truth


def test_repair_ranks_fixes_late_arrivals_for_affected_keys_only(spark):
    """A late event (precondition violation) is repaired by re-ranking
    ONLY its key; other keys' rows keep their stored ranks, and the
    final table equals the batch window over the full input."""
    from market_data_pipeline_databricks_spark.sources.tables import read_table
    from market_data_pipeline_databricks_spark.streaming.rank import (
        repair_ranks,
        stream_rank_maintenance,
    )

    feed_dir = tempfile.mkdtemp(prefix="rkfeed_")
    wh = tempfile.mkdtemp(prefix="rkwh_")
    try:
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "event_id", "ts", "user_id"
        )
        # hold back ONE early event of one user as the late arrival
        target = ev.orderBy("ts", "event_id").limit(1).first()
        on_time = ev.filter(F.col("event_id") != target.event_id)
        lo, hi = on_time.agg(F.min("ts"), F.max("ts")).first()
        mid = lo + (hi - lo) / 2
        for cond in (F.col("ts") < F.lit(mid), F.col("ts") >= F.lit(mid)):
            on_time.filter(cond).coalesce(1).write.mode("append").parquet(
                feed_dir
            )
        feed = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(feed_dir)
        )
        stream_rank_maintenance(feed, wh)
        before = {
            r.event_id: r.user_seq
            for r in read_table(spark, wh, "events_ranked").collect()
        }
        late = ev.filter(F.col("event_id") == target.event_id)
        repair_ranks(spark, late, wh)
        repair_ranks(spark, late, wh)  # idempotent re-run
        after = {
            r.event_id: r.user_seq
            for r in read_table(spark, wh, "events_ranked").collect()
        }
        w = Window.partitionBy("user_id").orderBy(
            F.asc("ts"), F.asc("event_id")
        )
        truth = {
            r.event_id: r.seq
            for r in ev.withColumn("seq", F.row_number().over(w)).collect()
        }
        assert after == truth
        # untouched keys kept their stored ranks
        other = {
            eid: s
            for eid, s in before.items()
            if truth[eid] == before[eid]
        }
        assert all(after[eid] == before[eid] for eid in other)
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)


def test_read_pruned_pushes_residual_filter_to_scan(spark, tmp_path):
    """The kept files' scan must carry the range as PushedFilters and a
    pruned ReadSchema — pruning composes with row-group skipping."""
    from market_data_pipeline_databricks_spark.sources.snapshots import (
        commit_append,
        evolve_partition_spec,
        read_pruned,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    commit_append(df, tdir)
    evolve_partition_spec(tdir, ["k"])
    commit_append(
        spark.range(1000, 2000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ),
        tdir,
        cluster_partitions=4,
    )
    plan = (
        read_pruned(spark, tdir, "k", 1100, 1200)
        .select("v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(k,1100)" in plan
    assert "LessThanOrEqual(k,1200)" in plan


def test_multi_key_spec_clusters_and_prunes_on_lead_key(spark, tmp_path):
    from market_data_pipeline_databricks_spark.sources.snapshots import (
        commit_append,
        evolve_partition_spec,
        prune_files,
        read_pruned,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    commit_append(df, tdir)
    evolve_partition_spec(tdir, ["k", "v"])
    commit_append(
        spark.range(100, 1100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ),
        tdir,
        cluster_partitions=5,
    )
    # bounds recorded for BOTH spec keys; lead-key pruning skips the
    # out-of-range clustered files (5 clustered + statless v1 files)
    kept_k, total = prune_files(tdir, "k", 100, 150)
    assert len(kept_k) < total
    got = read_pruned(spark, tdir, "k", 100, 150).count()
    assert got == 51
    # second key: v is 0..6 in every clustered file (range clustering
    # on (k, v) gives v the full domain per file), so an out-of-domain
    # range drops ALL clustered files and keeps only the statless v1
    # files — the conservative path
    kept_v, total_v = prune_files(tdir, "v", 100, 200)
    assert len(kept_v) < total_v
    assert read_pruned(spark, tdir, "v", 100, 200).count() == 0
