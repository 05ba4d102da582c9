"""Snapshot-diff CDC emission: op classification over the full matrix
(insert / update / delete / unchanged / NULL transitions), round-trip
with the upsert sink, and an all-NULL-values row still classifying."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.cdc import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, v double")


def test_snapshot_diff_full_matrix(spark):
    old = _snap(
        spark,
        [
            (1, "a", 1.0),   # unchanged
            (2, "b", 2.0),   # updated value
            (3, None, 3.0),  # NULL -> value (update)
            (4, "d", 4.0),   # deleted
            (6, None, None), # all-NULL compare values, unchanged
        ],
    )
    new = _snap(
        spark,
        [
            (1, "a", 1.0),
            (2, "b", 9.0),
            (3, "c", 3.0),
            (5, "e", 5.0),   # inserted
            (6, None, None),
        ],
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {2, 3, 4, 5}  # 1 and 6 unchanged -> absent
    assert out[2]._op == "update" and out[2].v == 9.0
    assert out[3]._op == "update" and out[3].name == "c"
    assert out[4]._op == "delete" and out[4].v == 4.0  # old values kept
    assert out[5]._op == "insert" and out[5].v == 5.0


def test_snapshot_diff_round_trips_through_upsert(spark, tmp_path):
    """Applying the emitted change set to the old snapshot reproduces
    the new snapshot exactly (deletes via erase, upserts via merge)."""
    from market_data_pipeline_databricks_spark.sources.writers import (
        erase_keys,
        overwrite_table,
        upsert_by_key,
    )

    old = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (4, "d", 4.0)])
    new = _snap(spark, [(1, "a", 1.0), (2, "b", 9.0), (5, "e", 5.0)])
    wh = str(tmp_path)
    overwrite_table(old, wh, "t", [])
    changes = snapshot_diff(old, new, ["k"])
    upserts = changes.filter(F.col("_op") != "delete").drop("_op")
    deletes = changes.filter(F.col("_op") == "delete").select("k")
    upsert_by_key(spark, upserts, wh, "t", ["k"], [])
    erase_keys(spark, wh, "t", deletes, ["k"], [])
    got = sorted(map(tuple, spark.read.parquet(f"{wh}/t").collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want
