"""Change-data-capture emission: diff two table snapshots into
insert / update / delete change rows.

The producer-side complement of the consumers in this repo: the
streaming upsert sink (streaming/ingest.py:stream_upsert_to_table)
and SCD2 (operators/scd.py) both APPLY change batches — this operator
GENERATES one from a pair of snapshots, which is how you bootstrap CDC
off a system that only hands you full dumps (the common case for
vendor market-data drops, reference config.yaml's daily full refresh).

Scale shape: one full-outer join on the key — a single co-partitioned
shuffle of both snapshots; the unchanged majority is filtered out
BEFORE any downstream work via a null-safe column comparison, so the
emitted change set is O(changes), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows that changed between ``old`` and ``new``, tagged with
    ``_op`` ∈ {insert, update, delete}. Output carries the NEW values
    for inserts/updates and the OLD values for deletes; unchanged rows
    (null-safe equality across ``compare_cols``) are dropped.

    ``compare_cols`` defaults to every non-key column the snapshots
    share."""
    if compare_cols is None:
        shared = [c for c in new.columns if c in set(old.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]

    # presence flags must come from a column that exists per side even
    # when every compare column is NULL-valued: a literal marker, not a
    # value column, decides insert vs delete
    o = old.withColumn("_o_present", F.lit(True)).alias("o")
    n = new.withColumn("_n_present", F.lit(True)).alias("n")
    joined = o.join(n, on=key_cols, how="full_outer")

    same = None
    for c in compare_cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    if same is None:
        same = F.lit(True)

    op = (
        F.when(F.col("_o_present").isNull(), F.lit("insert"))
        .when(F.col("_n_present").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    value_side = [
        F.when(F.col("_n_present").isNotNull(), F.col(f"n.{c}"))
        .otherwise(F.col(f"o.{c}"))
        .alias(c)
        for c in compare_cols
    ]
    return (
        joined.withColumn("_op", op)
        .filter(F.col("_op").isNotNull())
        .select(*key_cols, *value_side, "_op")
    )
