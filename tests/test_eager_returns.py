"""EAGER-return contract lint.

History, with the final diagnosis so the wrong theories are never
re-derived: the r8-r10 hash-RED rows were blamed on the EAGER return
plumbing (r8: localCheckpoint over deleted dirs; r9: "the driver hash
only accepts testdata-parquet-rooted plans"). Round 10's conversion to
lazy parquet-rooted twins was executed correctly and the rows STAYED
red — the true cause (VERDICT r10) is that the driver's value hash
canonicalizes DecimalType through a trailing-zero-dropping float-like
form on one side only, so final DecimalType/timestamp_ntz columns fail
regardless of plan rooting; the EAGER family was simply the family
written decimal-exact. Round 11 casts those final columns to
DOUBLE/DATE on both sides (tests/test_schema_lint.py enforces it).

The round-10 return discipline is kept on its own merits — lazy
parquet-rooted returns are recomputable forever with no checkpoint or
tempdir dependence. It split proof from return value
(plans/_eager.py:checked_lazy): the construction drive still runs, an
IN-QUERY multiset diff asserts its result equals a lazy
oracle-equivalent twin recomputed from the source parquet (raising
``ConstructionMismatchError`` on divergence → driver ``err`` → hard
red), and the twin is what gets returned.

This file makes that contract executable for EVERY registry query that
writes at construction:

1. the returned plan's input files all live under the testdata dir —
   nothing under /tmp, no checkpoint, no driver-held rows — so the
   frame is indistinguishable from the registry's always-green lazy
   plans;
2. re-evaluation after ``clearCache()`` is stable;
3. MUTATION tests: sabotaging a construction (skipping the snapshot
   merge; lying about the compaction file count) makes the in-query
   assertion raise — the proof is load-bearing, not decorative.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pytest

import __spark_entry__ as entrymod

# Every registry query that creates filesystem/catalog state at
# construction and cleans it up before returning. Mirrors the
# write-at-construction subset of test_plan_lint.EAGER plus the
# availableNow stream drivers.
CONSTRUCTION_WRITERS = (
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    "warehouse_erase_rtbf",
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    "warehouse_snapshot_cdc",
    "warehouse_vacuum_audit",
    "warehouse_write_audit_publish",
    "scale_zorder_clustering",
    "scale_layout_zorder_pruning",
    "scale_bucketed_join",
    "scale_dynamic_partition_pruning",
    "stream_gold_incremental",
    "stream_cdc_incremental",
    "stream_image_dedup_incremental",
    "stream_snapshot_commits",
    "stream_state_store_audit",
)

SF = "/root/testdata/sf0.001"


def _local_path(uri: str) -> str:
    p = urlparse(uri)
    return p.path if p.scheme in ("file", "") else uri


@pytest.mark.parametrize("name", CONSTRUCTION_WRITERS)
def test_eager_return_is_testdata_rooted(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)

    lineage = df._jdf.queryExecution().toRdd().toDebugString()
    assert "CheckpointRDD" not in lineage, (
        f"{name}: returned plan is rooted in a checkpoint — return the "
        "lazy twin from checked_lazy (plans/_eager.py)"
    )

    files = [_local_path(f) for f in df.inputFiles()]
    stray = [f for f in files if not f.startswith("/root/testdata/")]
    assert files and not stray, (
        f"{name}: returned plan must scan ONLY the source testdata "
        f"parquet (return-discipline contract: recomputable forever, "
        f"no tempdir/checkpoint dependence); found "
        f"{stray[:3] or 'no files'}"
    )

    before = sorted(map(str, df.collect()))
    # simulate the builder's cached/checkpointed state vanishing
    spark.catalog.clearCache()
    after = sorted(map(str, df.collect()))
    assert before == after, f"{name}: re-evaluation changed the result"


def test_construction_writers_is_superset_of_converted_set():
    """Every name above must exist in the registry (catch renames)."""
    qs = entrymod.queries()
    missing = [n for n in CONSTRUCTION_WRITERS if n not in qs]
    assert not missing, f"stale CONSTRUCTION_WRITERS entries: {missing}"


# ---------------------------------------------------------------------------
# checked_lazy unit contract
# ---------------------------------------------------------------------------


def test_checked_lazy_passes_and_returns_twin(spark):
    from market_data_pipeline_databricks_spark.plans._eager import checked_lazy

    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x"), (2, "y")], "k long, v string")
    out = checked_lazy(a, b, "unit")
    assert out is b  # the lazy twin is the return value


@pytest.mark.parametrize(
    "constructed_rows",
    [
        [(1, "x")],                          # lost a row
        [(1, "x"), (2, "y"), (2, "y")],      # duplicated a row
        [(1, "x"), (2, "z")],                # mutated a value
    ],
)
def test_checked_lazy_raises_on_multiset_divergence(spark, constructed_rows):
    from market_data_pipeline_databricks_spark.plans._eager import (
        ConstructionMismatchError,
        checked_lazy,
    )

    twin = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    bad = spark.createDataFrame(constructed_rows, "k long, v string")
    with pytest.raises(ConstructionMismatchError, match="diverged"):
        checked_lazy(bad, twin, "unit")


def test_checked_lazy_raises_on_schema_drift(spark):
    from market_data_pipeline_databricks_spark.plans._eager import (
        ConstructionMismatchError,
        checked_lazy,
    )

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ConstructionMismatchError, match="schema"):
        checked_lazy(a, b, "unit")


def test_checked_lazy_nulls_and_nans_group_as_equal(spark):
    """NULL and NaN must compare equal to themselves (the multiset
    semantics the driver's oracle gate uses)."""
    from market_data_pipeline_databricks_spark.plans._eager import checked_lazy

    rows = [(None, float("nan")), (1, 2.0)]
    a = spark.createDataFrame(rows, "k long, v double")
    b = spark.createDataFrame(list(reversed(rows)), "k long, v double")
    checked_lazy(a, b, "unit")  # must not raise


# ---------------------------------------------------------------------------
# Mutation tests: sabotage a construction → the in-query assertion fires
# ---------------------------------------------------------------------------


def test_sabotaged_snapshot_merge_raises(spark, monkeypatch):
    """Skip the COW merge (v2 silently == v1): warehouse_time_travel's
    checked_lazy must catch the broken construction."""
    from market_data_pipeline_databricks_spark.plans import warehouse_ops
    from market_data_pipeline_databricks_spark.plans._eager import (
        ConstructionMismatchError,
    )
    from market_data_pipeline_databricks_spark.sources import snapshots

    def no_merge(spark_, tdir, batch, keys):
        # commit an identical version instead of merging the batch
        return snapshots.commit_append(
            snapshots.read_version(spark_, tdir, 1), tdir
        )

    monkeypatch.setattr(snapshots, "commit_merge_keys", no_merge)
    with pytest.raises(ConstructionMismatchError, match="warehouse_time_travel"):
        warehouse_ops.warehouse_time_travel(spark, SF)


def test_sabotaged_compaction_count_raises(spark, monkeypatch):
    """Lie about the post-compaction file count: the n_files_after
    column diverges from the twin's countDistinct(p_year) and the
    in-query assertion fires."""
    from market_data_pipeline_databricks_spark.plans import warehouse_ops
    from market_data_pipeline_databricks_spark.plans._eager import (
        ConstructionMismatchError,
    )
    from market_data_pipeline_databricks_spark.sources import writers

    real = writers.compact_table

    def lying_compact(*args, **kwargs):
        return real(*args, **kwargs) + 1

    monkeypatch.setattr(writers, "compact_table", lying_compact)
    with pytest.raises(
        ConstructionMismatchError, match="warehouse_compact_small_files"
    ):
        warehouse_ops.warehouse_compact_small_files(spark, SF)


# ---------------------------------------------------------------------------
# materialize() retains its own contract (intra-query use)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_materialize_roundtrip_property(spark):
    """Property: materialize() preserves values and schema exactly for
    the types EAGER queries emit (strings with unicode, longs at the
    int64 edges, decimals, dates, doubles incl. non-dyadic values,
    NULLs). Hypothesis drives the row content."""
    import datetime as dt
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    from market_data_pipeline_databricks_spark.plans._eager import materialize

    cents = st.integers(min_value=-10**15, max_value=10**15)
    row = st.tuples(
        st.one_of(st.none(), st.text(max_size=12)),
        st.one_of(
            st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
        ),
        st.one_of(
            st.none(), cents.map(lambda c: Decimal(c).scaleb(-2))
        ),
        st.one_of(
            st.none(),
            st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)),
        ),
        st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    )

    @settings(max_examples=15, deadline=None)
    @given(st.lists(row, max_size=8))
    def check(rows):
        schema = (
            "s string, l long, d decimal(27,2), dt date, f double"
        )
        src = spark.createDataFrame(rows, schema)
        out = materialize(src)
        assert out.schema == src.schema
        assert sorted(map(repr, out.collect())) == sorted(
            map(repr, src.collect())
        )

    check()


def test_materialize_caps_row_count(spark):
    from market_data_pipeline_databricks_spark.plans._eager import materialize

    with pytest.raises(ValueError, match="row-scaled"):
        materialize(spark.range(100), max_rows=99)
    assert materialize(spark.range(100), max_rows=100).count() == 100


def test_release_keepalive_reclaims_dirs():
    import os

    from market_data_pipeline_databricks_spark.plans import _eager

    d = _eager.keepalive_dir("ka_test_")
    assert os.path.isdir(d)
    assert _eager.release_keepalive() >= 1
    assert not os.path.exists(d)
    assert _eager.release_keepalive() == 0


def test_checked_lazy_rejects_reserved_diff_columns(spark):
    """_side/_delta collide with the diff's bookkeeping columns —
    withColumn would silently replace them and the proof would compare
    the wrong data (round-10 advice)."""
    from market_data_pipeline_databricks_spark.plans._eager import checked_lazy

    df = spark.createDataFrame([(1, 1)], "k long, _side long")
    with pytest.raises(ValueError, match="_side"):
        checked_lazy(df, df, "t")
    df2 = spark.createDataFrame([(1, 1)], "k long, _delta long")
    with pytest.raises(ValueError, match="_delta"):
        checked_lazy(df2, df2, "t")


def test_checked_lazy_rejects_map_columns(spark):
    """Map-typed columns cannot be GROUP BY keys — the multiset diff
    would throw a cryptic analysis error; fail with a clear one."""
    from pyspark.sql import functions as F

    from market_data_pipeline_databricks_spark.plans._eager import checked_lazy

    df = spark.range(1).select(
        F.create_map(F.lit("a"), F.lit(1)).alias("m")
    )
    with pytest.raises(ValueError, match="map"):
        checked_lazy(df, df, "t")


def test_checked_lazy_rejects_nested_map_columns(spark):
    from pyspark.sql import functions as F

    from market_data_pipeline_databricks_spark.plans._eager import checked_lazy

    df = spark.range(1).select(
        F.struct(F.create_map(F.lit("a"), F.lit(1)).alias("m")).alias("s")
    )
    with pytest.raises(ValueError, match="map"):
        checked_lazy(df, df, "t")
