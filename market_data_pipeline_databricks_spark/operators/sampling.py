"""Deterministic sampling / dataset splitting for training pipelines.

Spark's ``df.sample``/``sampleBy`` are seed-deterministic only per
partitioning — a repartition changes which rows are picked. Training
pipelines need *content-deterministic* splits: the same row lands in
the same split on any cluster, any partition layout, any engine. So we
bucket on a salted md5 of the row id (portable: identical in DuckDB,
hash-matched in the oracle gate) and split on bucket thresholds.

Scale: pure Column algebra on the id — no shuffle, no state; the split
is a filter that pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(col: Column, seed: str = "split") -> Column:
    """Stable bucket in [0, N_BUCKETS): first 8 hex chars of the salted
    md5, as an integer, mod N_BUCKETS. Content-addressed — independent
    of partitioning, ordering, engine."""
    h = F.md5(F.concat(col.cast("string"), F.lit(":"), F.lit(seed)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_BUCKETS).cast(
        "int"
    )


def split_column(col: Column, test_frac: float, seed: str = "split") -> Column:
    """'test' for ~test_frac of rows, else 'train' — by hash bucket."""
    cut = int(round(test_frac * N_BUCKETS))
    return F.when(hash_bucket(col, seed) < cut, "test").otherwise("train")


def train_test_split(
    df: DataFrame, id_col: str, test_frac: float = 0.1, seed: str = "split"
) -> tuple[DataFrame, DataFrame]:
    tagged = df.withColumn("__split__", split_column(F.col(id_col), test_frac, seed))
    train = tagged.filter(F.col("__split__") == "train").drop("__split__")
    test = tagged.filter(F.col("__split__") == "test").drop("__split__")
    return train, test


def stratified_sample(
    df: DataFrame, id_col: str, frac: float, seed: str = "sample"
) -> DataFrame:
    """Deterministic ~frac sample (content-addressed, per-row i.i.d.
    across any partitioning). For per-stratum fractions, filter per
    stratum with different seeds or thresholds."""
    cut = int(round(frac * N_BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), seed) < cut)
