"""EAGER-return contract lint (round-9 verdict task 3).

CORRECTNESS_r08 recorded 8 construction-time-writing registry queries
rows+schema-green but hash-RED: each returned a ``localCheckpoint()``
handle whose backing temp dir had already been ``rmtree``d, so the
result was unreproducible outside the builder's block-manager state.
The fix (plans/_eager.py) returns LocalRelation-materialized rows for
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
