"""Runtime (bloom) filter injection: the join-pruning mechanism that
matters when a selective dim filter meets a shuffle join at 100 TB —
the fact side gets a might_contain() pre-filter built from the dim
side's join keys, pruning fact rows BEFORE the exchange. This suite
pins the confs that enable it and asserts the filter actually lands in
the plan and preserves results."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

_CONFS = {
    # creation side (the filtered dim aggregate) must be under this
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    # application side (the fact scan) must be over this; testdata is
    # tiny, so drop the floor — on a real cluster the default (10GB)
    # already passes for any fact table worth pruning
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
    # force a shuffle join: broadcast joins don't need a runtime filter
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _confs(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _plan_query(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_SMALL}/part.parquet").filter(
        F.col("p_type") == "PROMO"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_injected_and_result_unchanged(spark):
    with _confs(spark, _CONFS):
        j = _plan_query(spark)
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized[:2000]
        got = {r.p_type: r.n for r in j.collect()}
    # same query without the runtime filter
    want = {r.p_type: r.n for r in _plan_query(spark).collect()}
    assert got == want and got  # non-empty and identical


def test_bloom_filter_absent_for_broadcast_join(spark):
    # when the dim side broadcasts, the join itself prunes at the
    # probe — Spark correctly skips the redundant runtime filter
    with _confs(
        spark,
        {
            **_CONFS,
            "spark.sql.autoBroadcastJoinThreshold": "10MB",
        },
    ):
        optimized = (
            _plan_query(spark)._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "might_contain" not in optimized
