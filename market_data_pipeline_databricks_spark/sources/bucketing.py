"""Bucketed tables: shuffle-free co-located joins.

At 100 TB, the dominant cost of a fact⋈fact equi-join is the shuffle
of both sides. Writing both tables bucketed by the join key
(``bucketBy(n, key)`` + ``sortBy``) pins rows to hash-deterministic
buckets at write time, so Catalyst plans a sort-merge join with NO
Exchange on either side — verified by :func:`assert_no_shuffle_join`
and tests/test_bucketing.py.

Bucketed tables require the session catalog (``saveAsTable``); bucket
count should be sized so one bucket ≈ one task's worth of data at the
target scale and must match on both sides of the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered)
    catalog table in parquet."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange.

    ShuffleExchangeExec prints as ``Exchange hashpartitioning(...)`` /
    ``rangepartitioning`` / ``SinglePartition``; BroadcastExchange is
    NOT a shuffle and is excluded.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.search(r"(?<!Broadcast)Exchange (hash|range|Single)", plan) is not None
