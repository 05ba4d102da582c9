"""Round-9 additions: Ed-Join edit-distance dedup and the DPP drive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_edit_distance_qgram_equals_brute_force(spark):
    """The prefix/count-filter chain must be LOSSLESS: the blocked
    plan's pairs equal the all-pairs levenshtein <= 4 ground truth."""
    got = sorted(
        (r.id_a, r.id_b, r.edit_dist)
        for r in entrymod.queries()["dedup_edit_distance_qgram"](
            spark, SF
        ).collect()
    )
    keys = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.substring("text", 1, 64).alias("key"))
    )
    a = keys.select(F.col("doc_id").alias("id_a"), F.col("key").alias("ka"))
    b = keys.select(F.col("doc_id").alias("id_b"), F.col("key").alias("kb"))
    truth = sorted(
        (r.id_a, r.id_b, r.d)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.levenshtein("ka", "kb").cast("long"))
        .filter(F.col("d") <= 4)
        .collect()
    )
    assert got == truth and len(truth) > 0


def test_edit_distance_banded_threshold_semantics(spark):
    """levenshtein(a, b, K) returns -1 beyond K; the query must never
    emit a distance outside [0, K]."""
    rows = entrymod.queries()["dedup_edit_distance_qgram"](spark, SF).collect()
    assert all(0 <= r.edit_dist <= 4 for r in rows)


def test_dpp_contract_raises_when_pruning_disabled(spark):
    """The in-query DPP assertion must fail loudly if dynamic partition
    pruning is off (a silent full scan at 100 TB), and pass with it on."""
    fn = entrymod.queries()["scale_dynamic_partition_pruning"]
    assert fn(spark, SF).count() > 0  # normal path: DPP planned
    key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        with pytest.raises(RuntimeError, match="dynamic"):
            fn(spark, SF)
    finally:
        spark.conf.set(key, old)


@pytest.mark.slow
def test_edit_distance_qgram_short_keys_lossless(spark, tmp_path):
    """Round-9 review finding: the q-gram count bound is vacuous when
    the longer key has <= q*K grams, so short keys get an exhaustive
    bucket. Synthetic corpus with no-shared-gram short pairs (e.g.
    'aaaa' vs 'bbbb', ed=4) and boundary lengths must still equal
    brute force."""
    texts = [
        "aaaa", "bbbb",            # ed 4, zero shared grams
        "ab", "cd",                # ed 2, below gram length
        "x" * 20, "y" * 18,        # short: no q-gram guarantee
        "hello world padding 23c", # short-bucket interior
        "hello world padding 23x",
        "z" * 24, "z" * 22,        # same band, within ed K
        "m" * 49, "m" * 47,        # short-bucket EDGE at q=10 (<=49)
        "n" * 50, "n" * 46,        # straddle: greatest=50 -> prefix branch
        "the quick brown fox jumps over the lazy dog again and more!",
        "the quick brown fox jumps over the lazy dog again and more?",
    ]
    rows = [(i, t, "en", "syn", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    d = str(tmp_path / "synth")
    docs.write.parquet(f"{d}/documents.parquet")

    got = sorted(
        (r.id_a, r.id_b, r.edit_dist)
        for r in entrymod.queries()["dedup_edit_distance_qgram"](
            spark, d
        ).collect()
    )
    keys = docs.select("doc_id", F.substring("text", 1, 64).alias("key"))
    a = keys.select(F.col("doc_id").alias("id_a"), F.col("key").alias("ka"))
    b = keys.select(F.col("doc_id").alias("id_b"), F.col("key").alias("kb"))
    truth = sorted(
        (r.id_a, r.id_b, r.d)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.levenshtein("ka", "kb").cast("long"))
        .filter(F.col("d") <= 4)
        .collect()
    )
    assert got == truth
    # the synthetic corpus must actually exercise the short bucket
    assert any(p for p in truth if len(texts[p[0]]) <= 23 and len(texts[p[1]]) <= 23)


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """Cross-restart state continuity: run a stateful availableNow
    aggregation over file A, STOP, land files B and C, resume with the
    SAME checkpoint — the second run must process only B and C (no
    double-count of A), and the state store must end exactly equal to
    the batch aggregate of A+B+C. This is the exactly-once statement
    ACROSS restarts, not just within one run."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    full = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )

    def run_stream():
        feed = spark.readStream.schema(
            "o_orderstatus string, p decimal(12,2)"
        ).parquet(src)
        agg = feed.groupBy("o_orderstatus").agg(
            F.sum("p").alias("sum_price"), F.count(F.lit(1)).alias("n_rows")
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q.lastProgress

    # run 1: only file A exists
    full.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderstatus", "p"
    ).coalesce(1).write.mode("append").parquet(src)
    run_stream()
    # files B and C land while the query is DOWN
    for part in (1, 2):
        full.filter(F.col("o_orderkey") % 3 == part).select(
            "o_orderstatus", "p"
        ).coalesce(1).write.mode("append").parquet(src)
    # run 2: same checkpoint — resumes from the recorded offset
    prog = run_stream()
    assert prog["numInputRows"] > 0  # it did process the new files

    got = {
        (r.k, str(r.s), r.n)
        for r in spark.read.format("statestore")
        .load(ck)
        .select(
            F.col("key.o_orderstatus").alias("k"),
            F.col("value.sum").cast("decimal(27,2)").alias("s"),
            F.col("value.count").alias("n"),
        )
        .collect()
    }
    want = {
        (r.k, str(r.s), r.n)
        for r in full.groupBy(F.col("o_orderstatus").alias("k"))
        .agg(
            F.sum("p").cast("decimal(27,2)").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want
