"""EAGER-return contract lint (round-9 verdict task 3).

CORRECTNESS_r08 recorded 8 construction-time-writing registry queries
rows+schema-green but hash-RED: each returned a ``localCheckpoint()``
handle whose backing temp dir had already been ``rmtree``d, so the
result was unreproducible outside the builder's block-manager state.
The fix (plans/_eager.py) returns materialized JVM-held rows for
bounded outputs and keepalive-dir lazy scans for row-scaled ones.

This test makes the contract executable for EVERY registry query that
writes at construction: the returned DataFrame must

1. not be rooted in a checkpoint (``*CheckpointRDD`` in the RDD
   debug string — lineage truncated, nothing recomputable once the
   blocks are gone; a ``ParallelCollectionRDD`` from ``materialize``
   holds its values in JVM memory and is allowed);
2. reference only input files that still exist on disk;
3. survive ``spark.catalog.clearCache()`` + unpersist-all and still
   collect to the same values (the closest local simulation of the
   driver hashing the frame after the builder's session state is
   gone).

A new EAGER query that writes temp state and leaks a checkpoint or a
deleted path into its return fails here the round it is added.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pytest

import __spark_entry__ as entrymod

# Every registry query that creates filesystem/catalog state at
# construction and cleans (some of) it up before returning. Mirrors
# the write-at-construction subset of test_plan_lint.EAGER plus the
# availableNow stream drivers.
CONSTRUCTION_WRITERS = (
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    "warehouse_erase_rtbf",
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    "warehouse_snapshot_cdc",
    "scale_zorder_clustering",
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
def test_eager_return_is_recomputable(spark, name):
    import os

    fn = entrymod.queries()[name]
    df = fn(spark, SF)

    lineage = df._jdf.queryExecution().toRdd().toDebugString()
    assert "CheckpointRDD" not in lineage, (
        f"{name}: returned plan is rooted in a checkpoint — "
        "unreproducible once block-manager state is gone; return "
        "materialize(df) or a keepalive_dir scan (plans/_eager.py)"
    )

    missing = [
        f for f in df.inputFiles() if not os.path.exists(_local_path(f))
    ]
    assert not missing, (
        f"{name}: returned plan references deleted files: {missing[:3]}"
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
    import pytest

    from market_data_pipeline_databricks_spark.plans._eager import materialize

    with pytest.raises(ValueError, match="row-scaled"):
        materialize(spark.range(100), max_rows=99)
    assert materialize(spark.range(100), max_rows=100).count() == 100
