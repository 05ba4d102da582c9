"""Scale-path operators: salted plans equal plain plans; approximate
sketches stay inside their error bounds; partition pruning reaches the
scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.skew import salted_agg, salted_join
from market_data_pipeline_databricks_spark.plans import scale_ops as SO

from tests.conftest import SF_SMALL


def test_salted_agg_equals_plain(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.n, float(r.total))
        for r in salted_agg(
            li.select("l_returnflag", F.col("l_quantity").cast("decimal(27,2)").alias("q")),
            ["l_returnflag"],
            {"n": ("count", "*"), "total": ("sum", "q")},
            n_salt=8,
        ).collect()
    }
    want = {
        r.l_returnflag: (r.n, float(r.total))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("total"))
        .collect()
    }
    assert got == want


def test_approx_distinct_within_rsd(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    approx = {
        r.l_returnflag: r.approx_suppliers
        for r in SO.scale_approx_distinct(spark, SF_SMALL).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n")).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, approx[k], n)


def test_approx_percentiles_within_bound(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    approx = {
        r.l_returnflag: r.price_pcts
        for r in SO.scale_approx_percentiles(spark, SF_SMALL).collect()
    }
    exact = {
        r.l_returnflag: r.p
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("p"))
        .collect()
    }
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e < 0.02, (k, a, e)


def test_partition_pruning_reaches_scan(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    out = str(tmp_path / "part")
    li.withColumn("bucket", F.pmod("l_suppkey", F.lit(8))).write.partitionBy(
        "bucket"
    ).parquet(out)
    df = spark.read.parquet(out).filter(F.col("bucket") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "bucket#" in plan.split(
        "PartitionFilters"
    )[1][:120], plan[:800]
    # pruned read returns exactly the partition's rows
    want = li.filter(F.pmod("l_suppkey", F.lit(8)) == 3).count()
    assert df.count() == want


def test_max_drawdown_bounds_and_peak_start(spark):
    """Drawdown is in [-1, 0]; a key whose close series is
    non-increasing from its first day has drawdown = min/first - 1."""
    from market_data_pipeline_databricks_spark.plans.feature_ops import (
        funcs_max_drawdown,
    )

    rows = funcs_max_drawdown(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.max_drawdown <= 0.0


def test_vwap_between_min_and_max_price(spark):
    """VWAP is a convex combination of prices: for every (key, month)
    it must lie within [min, max] of that month's prices."""
    from pyspark.sql import functions as F
    from market_data_pipeline_databricks_spark.plans.feature_ops import (
        funcs_vwap_monthly,
    )

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    bounds = li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
    ).agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    joined = funcs_vwap_monthly(spark, SF_SMALL).join(bounds, ["suppkey", "month"])
    bad = joined.filter(
        (F.col("vwap") < F.col("lo") - 1e-6) | (F.col("vwap") > F.col("hi") + 1e-6)
    ).count()
    assert bad == 0


def test_weekly_ohlc_invariants(spark):
    """low <= open, close <= high; volume equals the daily sum; week
    boundaries are Mondays."""
    from market_data_pipeline_databricks_spark.plans.feature_ops import (
        funcs_weekly_ohlc,
    )

    rows = funcs_weekly_ohlc(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.week.weekday() == 0
        assert r.n_days >= 1


def test_segment_quantiles_ordering_and_coverage(spark):
    """p50 <= p90 per segment and the per-segment order counts cover
    every order exactly once (inner join on a total dimension)."""
    from market_data_pipeline_databricks_spark.plans.relational_ext import (
        agg_segment_value_quantiles,
    )

    rows = agg_segment_value_quantiles(spark, SF_SMALL).collect()
    n_orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.p50 <= r.p90


def test_weekly_ohlc_matches_pandas_replay(spark):
    """Weekly bars re-derived in pandas (Monday-start weeks, argmin/
    argmax open/close over the daily series) must match exactly."""
    import pandas as pd

    from market_data_pipeline_databricks_spark.plans.feature_ops import (
        funcs_weekly_ohlc,
    )

    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_suppkey", "l_shipdate", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    li["day"] = li["l_shipdate"].dt.date
    daily = (
        li.groupby(["l_suppkey", "day"])
        .agg(close=("l_extendedprice", "max"), volume=("l_quantity", "sum"))
        .reset_index()
    )
    daily["week"] = daily["day"].map(lambda d: d - pd.Timedelta(days=d.weekday()))
    expect = {}
    for (k, wk), g in daily.groupby(["l_suppkey", "week"]):
        g = g.sort_values("day")
        expect[(k, wk.date() if hasattr(wk, "date") else wk)] = (
            g.close.iloc[0],
            g.close.max(),
            g.close.min(),
            g.close.iloc[-1],
            round(float(g.volume.sum()), 2),
            len(g),
        )
    got = {
        (r.suppkey, r.week): (r.open, r.high, r.low, r.close, r.volume, r.n_days)
        for r in funcs_weekly_ohlc(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_max_drawdown_matches_pandas_replay(spark):
    """Drawdown re-derived as a pandas cummax walk over each key's
    daily closes must agree to the rounding grain."""
    import pandas as pd

    from market_data_pipeline_databricks_spark.plans.feature_ops import (
        funcs_max_drawdown,
    )

    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_suppkey", "l_shipdate", "l_extendedprice")
        .toPandas()
    )
    li["day"] = li["l_shipdate"].dt.date
    daily = (
        li.groupby(["l_suppkey", "day"])
        .agg(close=("l_extendedprice", "max"))
        .reset_index()
        .sort_values(["l_suppkey", "day"])
    )
    expect = {}
    for k, g in daily.groupby("l_suppkey"):
        dd = g.close / g.close.cummax() - 1
        expect[k] = (len(g), round(float(dd.min()), 6))
    got = {
        r.suppkey: (r.n_days, r.max_drawdown)
        for r in funcs_max_drawdown(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_hll_mergeable_distinct_algebra(spark):
    """Merged per-day partials must equal the direct whole-month sketch
    estimate EXACTLY (union of day sketches IS the month sketch), and
    both must sit within the HLL error bound of the exact count."""
    from market_data_pipeline_databricks_spark.plans.scale_ops import (
        scale_hll_mergeable_distinct,
    )

    sf = "/root/testdata/sf0.001"
    rows = scale_hll_mergeable_distinct(spark, sf).collect()
    assert rows
    ev = spark.read.parquet(f"{sf}/events.parquet")
    exact = {
        r["month"]: r["n"]
        for r in ev.groupBy(
            F.date_trunc("month", F.col("ts")).cast("date").alias("month")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["merged_users"] == r["direct_users"], "sketch algebra broken"
        assert abs(r["merged_users"] - exact[r["month"]]) <= max(
            2, 0.05 * exact[r["month"]]
        )
