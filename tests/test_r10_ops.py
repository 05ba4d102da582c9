"""Round-10 additions: vacuum audit, pairwise correlation, Benford."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_vacuum_audit_runs_and_matches_contract(spark):
    out = entrymod.queries()["warehouse_vacuum_audit"](spark, SF).collect()
    assert len(out) == 3  # one row per order status
    assert all(r.n_rows > 0 for r in out)


def test_vacuum_audit_raises_when_retention_lies(spark, monkeypatch):
    """Sabotage: expire_versions reports the wrong expiry count — the
    in-query contract must raise, not return a plausible frame."""
    from market_data_pipeline_databricks_spark.plans import warehouse_ops
    from market_data_pipeline_databricks_spark.sources import snapshots

    real = snapshots.expire_versions

    def lying(table_dir, keep_last=1):
        real(table_dir, keep_last)
        return (1, 0)

    monkeypatch.setattr(snapshots, "expire_versions", lying)
    with pytest.raises(RuntimeError, match="vacuum contract"):
        warehouse_ops.warehouse_vacuum_audit(spark, SF)


def test_vacuum_audit_raises_when_expired_version_readable(spark, monkeypatch):
    """Sabotage: retention keeps every manifest (no-op vacuum that
    still reports success) — time travel to v1 then still works and
    the audit must refuse."""
    from market_data_pipeline_databricks_spark.plans import warehouse_ops
    from market_data_pipeline_databricks_spark.sources import snapshots

    monkeypatch.setattr(
        snapshots, "expire_versions", lambda table_dir, keep_last=1: (2, 1)
    )
    with pytest.raises(RuntimeError, match="EXPIRED v1"):
        warehouse_ops.warehouse_vacuum_audit(spark, SF)


def test_pairwise_correlation_bounds_and_grain(spark):
    rows = entrymod.queries()["funcs_pairwise_correlation"](
        spark, SF
    ).collect()
    assert rows, "expected at least one qualifying pair"
    for r in rows:
        assert r.sk_a < r.sk_b
        assert r.n_days >= 30
        if r.ret_corr is not None:
            assert -1.0 <= r.ret_corr <= 1.0
    # upper triangle: no duplicate unordered pair
    pairs = [(r.sk_a, r.sk_b) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_pairwise_correlation_perfect_on_identical_series(spark, tmp_path):
    """Two series with identical return paths must correlate at 1.0,
    an inverted pair at a strictly negative value (anti-moving prices
    do not mean -1 simple returns, just negative co-movement)."""
    import datetime as dt

    rows = []
    base = dt.date(2025, 1, 1)
    for i in range(40):
        d = base + dt.timedelta(days=i)
        px = 100.0 + (i % 7) * 3  # non-constant, repeating pattern
        rows.append((1, d, px, 10))
        rows.append((2, d, px * 2, 10))      # scaled copy: identical returns
        rows.append((3, d, 400.0 - px, 10))  # inverted path
    df = spark.createDataFrame(
        rows, "l_suppkey long, l_shipdate date, l_extendedprice double, l_quantity long"
    )
    d = str(tmp_path / "synth")
    df.write.parquet(f"{d}/lineitem.parquet")
    got = {
        (r.sk_a, r.sk_b): r.ret_corr
        for r in entrymod.queries()["funcs_pairwise_correlation"](
            spark, d
        ).collect()
    }
    assert got[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    assert got[(1, 3)] < 0


def test_benford_audit_shares_sum_to_one(spark):
    rows = entrymod.queries()["quality_benford_audit"](spark, SF).collect()
    digits = sorted(r.digit for r in rows)
    assert set(digits) <= {str(i) for i in range(1, 10)}
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    # Benford expectations are fixed constants
    for r in rows:
        if r.digit == "1":
            assert r.benford_p == pytest.approx(0.301030, abs=1e-6)


def test_benford_audit_flags_fabricated_uniform_digits(spark, tmp_path):
    """A fabricated ledger with uniform leading digits must trip the
    deviation flag on digit 1 (11.1% observed vs 30.1% expected)."""
    rows = [
        (i, "O", float(d) * 1000 + 7, "1996-01-01")
        for i, d in enumerate(list(range(1, 10)) * 20)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    d = str(tmp_path / "synth")
    df.write.parquet(f"{d}/orders.parquet")
    got = {
        r.digit: r
        for r in entrymod.queries()["quality_benford_audit"](spark, d).collect()
    }
    assert got["1"].deviates and got["1"].obs_share == pytest.approx(1 / 9, abs=1e-6)


# ---------------------------------------------------------------------------
# Write-audit-publish
# ---------------------------------------------------------------------------


def test_wap_query_runs(spark):
    out = entrymod.queries()["warehouse_write_audit_publish"](
        spark, SF
    ).collect()
    assert len(out) == 3 and all(r.n_rows > 0 for r in out)


def test_wap_staging_is_isolated_and_publish_composes(spark, tmp_path):
    from market_data_pipeline_databricks_spark.sources.snapshots import (
        commit_append,
        latest_version,
        publish_staged,
        read_staged,
        read_version,
        stage_append,
    )

    tdir = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    commit_append(base, tdir)
    staged_batch = spark.createDataFrame([(3, "c")], "k long, v string")
    n_files = stage_append(staged_batch, tdir, "br")
    assert n_files >= 1
    # isolation: published latest unchanged, staged invisible to reads
    assert latest_version(tdir) == 1
    assert read_version(spark, tdir, 1).count() == 2
    assert read_staged(spark, tdir, "br").count() == 1
    # a commit landing BETWEEN stage and publish still composes
    commit_append(spark.createDataFrame([(4, "d")], "k long, v string"), tdir)
    v = publish_staged(tdir, "br")
    assert v == 3
    rows = {r.k for r in read_version(spark, tdir, 3).collect()}
    assert rows == {1, 2, 3, 4}
    # v2 (pre-publish) still excludes the staged row: time travel intact
    assert {r.k for r in read_version(spark, tdir, 2).collect()} == {1, 2, 4}


def test_wap_discard_removes_staged_files(spark, tmp_path):
    import glob

    from market_data_pipeline_databricks_spark.sources.snapshots import (
        commit_append,
        discard_staged,
        latest_version,
        stage_append,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    before = set(glob.glob(f"{tdir}/data/*/*.parquet"))
    stage_append(
        spark.createDataFrame([(9, "x")], "k long, v string"), tdir, "bad"
    )
    assert discard_staged(tdir, "bad") >= 1
    # published files untouched, staged files physically gone
    assert set(glob.glob(f"{tdir}/data/*/*.parquet")) == before
    assert latest_version(tdir) == 1


def test_wap_double_stage_same_branch_raises(spark, tmp_path):
    from market_data_pipeline_databricks_spark.sources.snapshots import (
        ConcurrentCommitError,
        commit_append,
        stage_append,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    df = spark.createDataFrame([(2, "b")], "k long, v string")
    stage_append(df, tdir, "br")
    with pytest.raises(ConcurrentCommitError, match="staged"):
        stage_append(df, tdir, "br")


def test_wap_audit_failure_raises_in_query(spark, monkeypatch):
    """Sabotage: the staged read returns a batch with a key that
    collides with v1 — the audit must halt the publish."""
    from market_data_pipeline_databricks_spark.plans import warehouse_ops
    from market_data_pipeline_databricks_spark.sources import snapshots

    real = snapshots.read_staged

    def colliding(spark_, table_dir, branch):
        # pretend the staged batch contains the published table's rows
        return snapshots.read_version(spark_, table_dir, 1)

    monkeypatch.setattr(snapshots, "read_staged", colliding)
    with pytest.raises(RuntimeError, match="WAP audit failed"):
        warehouse_ops.warehouse_write_audit_publish(spark, SF)


def test_wap_publish_retry_after_crash_is_idempotent(spark, tmp_path):
    """Crash window: publish succeeded but the staging marker was not
    removed. A retried publish must detect the already-published files
    and return the existing version instead of double-appending; a
    discard must refuse to delete the now-referenced files."""
    import json
    from pathlib import Path

    from market_data_pipeline_databricks_spark.sources.snapshots import (
        commit_append,
        discard_staged,
        latest_version,
        publish_staged,
        read_version,
        stage_append,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    stage_append(
        spark.createDataFrame([(2, "b")], "k long, v string"), tdir, "br"
    )
    marker = Path(tdir) / "staging-br.json"
    leftover = marker.read_text()
    v = publish_staged(tdir, "br")
    assert v == 2 and read_version(spark, tdir, 2).count() == 2
    # simulate the crash leftover and retry the publish
    marker.write_text(leftover)
    assert publish_staged(tdir, "br") == 2  # idempotent, no v3
    assert latest_version(tdir) == 2
    assert read_version(spark, tdir, 2).count() == 2
    # simulate the leftover again: discard must not delete LIVE files
    marker.write_text(leftover)
    assert discard_staged(tdir, "br") == 0
    assert read_version(spark, tdir, 2).count() == 2
    assert not marker.exists()


def test_wap_stage_manifest_claim_is_exclusive(spark, tmp_path):
    """The staging manifest is claimed create-exclusively: a stale or
    concurrent claim surfaces as ConcurrentCommitError even if the
    exists() pre-check would have raced (the manifest appears between
    check and write)."""
    from pathlib import Path

    from market_data_pipeline_databricks_spark.sources.snapshots import (
        ConcurrentCommitError,
        commit_append,
        stage_append,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    # an existing claim (any content) must make stage_append lose
    (Path(tdir) / "staging-br.json").write_text("{}")
    with pytest.raises(ConcurrentCommitError, match="staged"):
        stage_append(
            spark.createDataFrame([(2, "b")], "k long, v string"), tdir, "br"
        )


# ---------------------------------------------------------------------------
# Two-pass global rank
# ---------------------------------------------------------------------------


def test_global_rank_twopass_is_a_permutation_and_matches_window(spark):
    from pyspark.sql import Window

    out = entrymod.queries()["scale_global_rank_twopass"](spark, SF)
    rows = out.collect()
    n = len(rows)
    assert sorted(r.global_rank for r in rows) == list(range(1, n + 1))
    # equality with the mono-partition window form (the thing the
    # two-pass exists to avoid running at scale)
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(12,2)").alias("p")
    )
    w = Window.orderBy(F.desc("p"), F.asc("o_orderkey"))
    truth = {
        r.o_orderkey: r.rk
        for r in orders.withColumn("rk", F.row_number().over(w)).collect()
    }
    got = {r.o_orderkey: r.global_rank for r in rows}
    assert got == truth


def test_global_rank_twopass_table_window_is_distributed(spark):
    """The table-scaled window must be keyed on the range partition id
    — a plan whose ONLY window is unpartitioned would be the
    single-task shape the query exists to avoid. (The tiny offsets
    window over |parts| rows is allowed to be single-partition.)"""
    import re

    plan = (
        entrymod.queries()["scale_global_rank_twopass"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the table-scaled row_number's windowspecdefinition must be KEYED
    # on pid — a bare substring check on "pid" would pass even if the
    # window reverted to the unpartitioned single-task shape (pid still
    # appears in the projection and join key)
    assert re.search(r"row_number\(\) windowspecdefinition\(pid#", plan), (
        "table-scaled window is not keyed on the range partition id"
    )


def test_wap_publish_refuses_stale_marker_with_deleted_files(spark, tmp_path):
    """A staging marker whose files retention already deleted must make
    publish_staged raise instead of publishing dead file references."""
    import json
    from pathlib import Path

    from market_data_pipeline_databricks_spark.sources.snapshots import (
        ConcurrentCommitError,
        commit_append,
        publish_staged,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    (Path(tdir) / "staging-br.json").write_text(
        json.dumps(
            {"branch": "br", "files": [str(tmp_path / "gone.parquet")]}
        )
    )
    with pytest.raises(ConcurrentCommitError, match="stale"):
        publish_staged(tdir, "br")


def test_wap_publish_empty_staged_marker_is_pure_cleanup(spark, tmp_path):
    """An empty staged batch (e.g. the crash-retry shape after the
    staged files were absorbed and the list emptied, or a stager that
    produced zero files) must NOT mint a duplicate no-op version —
    publish removes the marker and returns the current version."""
    import json
    from pathlib import Path

    from market_data_pipeline_databricks_spark.sources.snapshots import (
        commit_append,
        latest_version,
        publish_staged,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    (Path(tdir) / "staging-br.json").write_text(
        json.dumps({"branch": "br", "files": []})
    )
    assert publish_staged(tdir, "br") == 1
    assert latest_version(tdir) == 1
    assert not (Path(tdir) / "staging-br.json").exists()


def test_wap_publish_rolls_back_claim_when_files_vanish(spark, tmp_path, monkeypatch):
    """Defense in depth for the one-operator-per-branch contract: if a
    concurrent discard deletes the staged files between the existence
    check and the manifest claim, publish must unpublish the claimed
    manifest and raise — never leave a version referencing dead files."""
    from pathlib import Path

    from market_data_pipeline_databricks_spark.sources import snapshots
    from market_data_pipeline_databricks_spark.sources.snapshots import (
        ConcurrentCommitError,
        commit_append,
        latest_version,
        stage_append,
    )

    tdir = str(tmp_path / "t")
    commit_append(spark.createDataFrame([(1, "a")], "k long, v string"), tdir)
    stage_append(
        spark.createDataFrame([(2, "b")], "k long, v string"), tdir, "br"
    )
    import json

    staged_files = json.loads(
        (Path(tdir) / "staging-br.json").read_text()
    )["files"]

    real_publish = snapshots._publish

    def racing_publish(table_dir, version, segments, removed, **meta):
        real_publish(table_dir, version, segments, removed, **meta)
        # simulate a concurrent discard winning right after the claim
        for f in staged_files:
            Path(f).unlink(missing_ok=True)

    monkeypatch.setattr(snapshots, "_publish", racing_publish)
    with pytest.raises(ConcurrentCommitError, match="tombstone"):
        snapshots.publish_staged(tdir, "br")
    # tombstone rollback: v2 stays readable as a no-op version equal to
    # v1 (an unlink would be a TOCTOU hole if a concurrent
    # commit_append had already built v3) — the chain has no gap and
    # no version references the deleted staged files
    assert latest_version(tdir) == 2
    assert (Path(tdir) / "v2.json").exists()
    v2_files = snapshots._read_manifest(tdir, 2)
    assert all(Path(f).exists() for f in v2_files)
    assert snapshots.read_version(spark, tdir, 2).count() == 1
    assert snapshots.read_version(spark, tdir, 1).count() == 1


def test_wap_publish_empty_staged_on_unpublished_table_raises(spark, tmp_path):
    """prev == 0 is not a publishable version: the marker is cleaned up
    but the caller gets a clear error instead of a version number that
    read_version would crash on."""
    import json
    from pathlib import Path

    from market_data_pipeline_databricks_spark.sources.snapshots import (
        publish_staged,
    )

    tdir = str(tmp_path / "t")
    Path(tdir).mkdir(parents=True)
    (Path(tdir) / "staging-br.json").write_text(
        json.dumps({"branch": "br", "files": []})
    )
    with pytest.raises(ValueError, match="never-published"):
        publish_staged(tdir, "br")
    assert not (Path(tdir) / "staging-br.json").exists()
