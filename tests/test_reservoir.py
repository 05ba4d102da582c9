"""Weighted reservoir (A-ES): exact k, determinism across
partitionings, weight monotonicity, zero-weight exclusion, and the
statistical law itself — empirical pick frequency tracks w/Σw across
many seeds, computed in ONE Spark job via a seed explosion."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.sampling import (
    weighted_reservoir,
)


def _docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", F.col("n_chars").cast("double").alias("w"))


def test_exact_k_and_partitioning_invariance(spark):
    d = _docs(spark)
    a = {r.doc_id for r in weighted_reservoir(d, "doc_id", "w", 25).collect()}
    b = {
        r.doc_id
        for r in weighted_reservoir(
            d.repartition(13), "doc_id", "w", 25
        ).collect()
    }
    assert len(a) == 25 and a == b


def test_huge_weight_forces_inclusion_and_zero_excludes(spark):
    d = _docs(spark).withColumn(
        "w",
        F.when(F.col("doc_id") == 7, 1e12)
        .when(F.col("doc_id") == 8, 0.0)
        .otherwise(F.col("w")),
    )
    got = {r.doc_id for r in weighted_reservoir(d, "doc_id", "w", 10).collect()}
    assert 7 in got and 8 not in got


def test_key_granularity_no_ties_on_equal_weights(spark):
    """The A-ES key must not collide within a weight class: the old
    10⁴-bucket u gave ~1e-4 granularity, so equal-weight rows shared
    identical keys and the deterministic id tie-break biased the draw
    toward low ids (round-4 advice). With 52-bit uniforms, 20k
    equal-weight rows produce 20k distinct keys (collision probability
    ~4e-8) and the selected set is not an id prefix."""
    d = spark.range(20_000).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("w")
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":res")))
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long").cast("double")
        + 0.5
    ) / float(1 << 52)
    keys = d.select((F.log(u) / F.col("w")).alias("k"))
    assert keys.distinct().count() == 20_000
    got = {r.doc_id for r in weighted_reservoir(d, "doc_id", "w", 50).collect()}
    assert got != set(range(50))  # not the lowest-id prefix


def test_pick_frequency_tracks_weights(spark):
    """k=1 over weights 1,1,2,4: P(pick row i) = w_i/8 exactly (A-ES
    with k=1 reduces to a weighted argmax). 400 seeds in one job."""
    rows = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 2.0), (4, 4.0)], "id long, w double"
    )
    seeds = spark.range(400).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("seed")
    )
    crossed = rows.crossJoin(seeds)
    # inline the key with a per-row seed (weighted_reservoir takes a
    # literal seed, so rebuild its 52-bit-u expression with the seed
    # COLUMN)
    h = F.md5(
        F.concat(F.col("id").cast("string"), F.lit(":"), F.col("seed"))
    )
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long").cast("double")
        + 0.5
    ) / float(1 << 52)
    key = F.log(u) / F.col("w")
    w = Window.partitionBy("seed").orderBy(F.desc("_k"), F.asc("id"))
    winners = (
        crossed.withColumn("_k", key)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    freq = {r.id: r.n / 400 for r in winners.collect()}
    want = {1: 1 / 8, 2: 1 / 8, 3: 2 / 8, 4: 4 / 8}
    for i, p in want.items():
        assert abs(freq.get(i, 0.0) - p) < 0.07, (i, freq)


def test_stratified_reservoir_exact_k_per_stratum(spark):
    from market_data_pipeline_databricks_spark.operators.sampling import (
        stratified_weighted_reservoir,
    )

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", F.col("n_chars").cast("double").alias("w"))
    out = stratified_weighted_reservoir(d, "doc_id", "w", "source", 5)
    per = {r.source: r.n for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    avail = {r.source: r.n for r in d.filter(F.col("w") > 0).groupBy(
        "source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {s: min(5, n) for s, n in avail.items()}
    # partitioning invariance (content-addressed keys)
    again = {
        r.doc_id
        for r in stratified_weighted_reservoir(
            d.repartition(13), "doc_id", "w", "source", 5
        ).collect()
    }
    assert again == {r.doc_id for r in out.collect()}
