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

from pyspark.sql import Column, DataFrame, Window
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


def weighted_sample_flag(
    id_col: Column, rate_col: Column, seed: str = "mix"
) -> Column:
    """Keep-flag for per-stratum (domain-mixture) downsampling:
    ``rate_col`` is the keep fraction in [0, 1] for this row's stratum
    (typically a CASE/map over a domain column). Content-addressed like
    every sampler here — pure Column algebra, pushes to the scan."""
    return hash_bucket(id_col, seed) < F.round(rate_col * N_BUCKETS).cast("int")


def weighted_reservoir(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "res",
) -> DataFrame:
    """Exact-k weighted sample WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each row draws a content-addressed uniform u and competes on
    the key ln(u)/w — the k largest keys are a weighted-without-
    replacement sample. The flag sampler above approximates a RATE;
    this guarantees an exact COUNT, which is what fixed-budget
    curation ("keep the best 10M documents, weighted by quality")
    needs.

    Determinism: u derives from the first 52 bits (13 hex chars) of
    the salted md5 — content-addressed like every sampler here, so the
    same k rows are chosen on any cluster, partitioning, or engine.
    52 bits matter here where the 10⁴-bucket coarse hash suffices for
    rate samplers: with only 1e-4 granularity, rows in the same weight
    class collide on identical keys and ties resolve deterministically
    to the lowest id, biasing the exact-k draw away from the A-ES
    distribution at corpus scale (round-4 advice). A 52-bit u is
    exactly representable in a double (< 2⁵³), so +0.5 and the
    power-of-two division stay bit-exact cross-engine. Non-positive
    weights are excluded by contract.

    Scale: key computation is per-row Column algebra on the scan; the
    selection is a TakeOrdered (per-partition top-k, then a k-row
    merge on the driver) — no global sort, no shuffle of the data."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), F.lit(seed)))
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long").cast("double") + 0.5
    ) / float(1 << 52)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_res_key", key)
        .orderBy(F.desc("_res_key"), F.asc(id_col))
        .limit(k)
        .drop("_res_key")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard LLM pretraining
    step): documents are concatenated in ``id_col`` order within each
    ``shard_col`` and cut into fixed ``budget``-token chunks; each doc
    is assigned the chunk range [start_chunk, end_chunk] it occupies
    (a doc may straddle a boundary).

    Scale: the running total is a per-shard window cumsum — one shuffle
    on the shard key, never a global sort. At 100 TB shards are file
    groups / sources / split buckets, each bounded; a GLOBAL ordering
    would serialize the whole corpus through one partition, which is
    why the shard column is required rather than defaulted."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    start = cum - F.col(token_col)
    return df.select(
        shard_col,
        id_col,
        F.col(token_col),
        F.floor(start / budget).cast("long").alias("start_chunk"),
        F.floor((cum - 1) / budget).cast("long").alias("end_chunk"),
    )


def training_shuffle(
    df: DataFrame, id_col: str, n_shards: int = 8, seed: str = "shuffle"
) -> DataFrame:
    """Deterministic global training shuffle without a global sort.

    Pretraining wants examples in a pseudorandom order that is (a)
    reproducible across clusters/partitionings and (b) cheap at 100 TB.
    A global ORDER BY rand() is neither: it range-shuffles the whole
    corpus and depends on partition layout. Instead: shard =
    content-hash of the id (uniform, portable), position = rank of a
    second salted hash WITHIN the shard. One shuffle on the shard key,
    per-shard local sort — shards are independent output files a data
    loader then reads round-robin. Same md5 discipline as the
    splitters above, so the assignment is engine-portable and
    oracle-checkable (the id breaks md5-collision ties
    deterministically)."""
    shard = (hash_bucket(F.col(id_col), seed) % n_shards).cast("int")
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.lit(seed), F.lit(":k"))
    )
    tagged = df.withColumn("shard", shard).withColumn("__k__", key)
    w = Window.partitionBy("shard").orderBy(F.col("__k__"), F.col(id_col))
    return tagged.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("__k__")


def stratified_weighted_reservoir(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    stratum_col: str,
    k: int,
    seed: str = "res",
) -> DataFrame:
    """Exact-k weighted sample WITHOUT replacement PER STRATUM — the
    per-source curation budget ("best 1M docs from EACH source,
    weighted by quality") that the global reservoir cannot express. Same A-ES
    key as :func:`weighted_reservoir` (52-bit content-addressed u), but
    selection is a ROW_NUMBER over the stratum partition instead of a
    global TakeOrdered: one shuffle on the stratum key, per-partition
    top-k state, no global sort. Strata with fewer than ``k`` positive-
    weight rows keep everything (standard stratified semantics)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), F.lit(seed)))
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long").cast("double") + 0.5
    ) / float(1 << 52)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc("_res_key"), F.asc(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_res_key", key)
        .withColumn("_res_rn", F.row_number().over(w))
        .filter(F.col("_res_rn") <= k)
        .drop("_res_key", "_res_rn")
    )
