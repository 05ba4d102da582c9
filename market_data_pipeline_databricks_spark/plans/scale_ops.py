"""Scale-path queries: skew mitigation proven result-identical.

Salting changes the shuffle layout, never the answer — so these carry
full DuckDB oracles written as the PLAIN (unsalted) SQL: the salted
plan must hash-match the straightforward aggregation/join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from market_data_pipeline_databricks_spark.plans._eager import checked_lazy
from market_data_pipeline_databricks_spark.plans.relational import _t


def skew_salted_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation by l_returnflag (3 hot keys ≈ the
    worst realistic agg skew: every row is a hot key). Decimal sums
    survive the partial/merge split exactly."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(27,2)").alias("qty_d"),
        F.col("l_extendedprice").cast("decimal(27,2)").alias("price_d"),
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", "qty_d"),
            "sum_price": ("sum", "price_d"),
            "n_rows": ("count", "*"),
            "max_price": ("max", "price_d"),
        },
        n_salt=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_price").cast("double").alias("max_price"),
    )


def skew_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salted join: orders ⋈ customer where two customer keys
    are declared hot — result must equal the plain join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        o.withColumnRenamed("o_custkey", "custkey"),
        c.withColumnRenamed("c_custkey", "custkey"),
        key="custkey",
        hot_keys=[1, 2],
        n_salt=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias(
            "total_price"
        ),
    )


def scale_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts (rsd=0.5%): at 100 TB an exact
    COUNT(DISTINCT) shuffles every distinct value; HLL ships a fixed
    ~KB sketch per group. Rows-only driver check; the rsd error bound
    vs exact is asserted in tests/test_scale_ops.py."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.005).alias("approx_suppliers"),
        F.approx_count_distinct("l_partkey", rsd=0.005).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def scale_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count maintenance via MERGEABLE HLL
    sketches (Spark 4 Apache DataSketches surface): per-day partial
    sketches (`hll_sketch_agg`) union into monthly estimates
    (`hll_union_agg`) — the pattern that maintains a distinct-users
    dashboard from daily increments WITHOUT rescanning history. At
    100 TB each partial is a fixed ~KB register set; re-aggregation
    cost is O(days), not O(events).

    Emits per month: the merged-partials estimate AND the direct
    whole-month estimate — identical by sketch algebra (union of
    per-day sketches IS the month sketch), which the pytest pins
    along with the HLL error bound vs exact. Rows-only driver check
    (DuckDB has no compatible sketch)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.to_date("ts").alias("day"),
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    merged = daily.groupBy("month").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("merged_users")
    )
    direct = ev.groupBy(F.date_trunc("month", F.col("ts")).alias("month")).agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
            "direct_users"
        )
    )
    return merged.join(direct, "month").select(
        F.col("month").cast("date").alias("month"),
        "merged_users",
        "direct_users",
    )


def scale_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch, accuracy 1e4):
    mergeable fixed-size sketches instead of a global sort. Rows-only
    driver check; error bound vs exact asserted in tests."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_pcts"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )





def join_range_binned_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1's 60-day volatility expansion through the BINNED range join
    (operators/rangejoin.py): hash-join shuffles instead of the
    broadcast-nested-loop a raw interval predicate forces — the plan
    that survives when neither side broadcasts. Oracle: identical SQL
    to join_range_volatility_expansion."""
    from market_data_pipeline_databricks_spark.operators.rangejoin import (
        range_join_binned,
    )

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias(
            "revenue"
        )
    )
    anchors = daily.select(
        F.col("day").alias("a_day"), F.col("revenue").alias("a_revenue")
    )
    probes = daily.select(
        F.col("day").alias("p_day"), F.col("revenue").alias("p_revenue")
    )
    epoch = F.lit("1992-01-01").cast("date")
    joined = range_join_binned(
        probes,
        anchors,
        left_time="p_day",
        right_time="a_day",
        window=59,
        time_unit_expr=lambda c: F.datediff(c, epoch),
    )
    return (
        joined.groupBy(
            F.col("a_day").alias("day"), F.col("a_revenue").alias("revenue")
        )
        .agg(
            F.round(
                F.sum(F.col("p_revenue").cast("decimal(27,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_rev_60d")
        )
        .filter(F.col("revenue") > 1.5 * F.col("avg_rev_60d"))
    )

def scale_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (continuous, linear interpolation) — the
    oracle-checkable twin of scale_approx_percentiles. Spark's
    ``percentile`` aggregate buffers each group's values, so at 100 TB
    the sketch path is the default and this is the per-group-bounded
    verifier (|group| here is O(rows/3), fine at test scale; on a
    cluster you run it on bounded groups or samples)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def scale_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group mean — robust stats for a fact column with
    heavy tails: clamp each value into its group's [p01, p99] band,
    then average. Two passes over the group: the percentile pass
    reduces to O(groups) rows that broadcast back onto the fact scan
    (bounded — same discipline as the other scalar broadcasts; like
    scale_exact_percentiles, the exact percentile buffers each group's
    values, so at 100 TB the bounds come from the approx_percentile
    sketch instead — the clamp-and-decimal-mean stage is unchanged), and
    the clamped mean runs through a decimal sum so both engines round
    identical bits. Percentile bounds are rounded to 6 dp BEFORE the
    clamp in both engines so the clamp boundary itself is bit-stable
    (percentile interpolation is deterministic on the sorted multiset,
    but the rounding pins any last-ulp divergence)."""
    li = _t(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.01)"), 6).alias("p01"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
    )
    clamped = li.join(F.broadcast(pct), "l_returnflag").withColumn(
        "w", F.greatest(F.col("p01"), F.least(F.col("p99"), F.col("l_extendedprice")))
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("raw_mean"),
        F.round(
            F.sum(F.col("w").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("winsorized_mean"),
        F.max("p01").alias("p01"),
        F.max("p99").alias("p99"),
    )


def scale_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report for a prospective shuffle key — the measurement
    you run BEFORE choosing between a plain shuffle, AQE skew-join, or
    explicit salting (`operators/skew.py`). Per key-column: distinct
    key count, heaviest key's row count, mean rows/key, the p99 of the
    per-key distribution, and the skew ratio (max/mean) that decides
    the strategy.

    Scale: one count-aggregate per key column (map-side combinable —
    the per-key frame is O(distinct keys), not O(rows)); the second
    stage aggregates that bounded frame to ONE row per column. The
    exact percentile buffers only the per-key counts (O(keys)), not
    fact rows. Mean runs through a decimal sum."""
    li = _t(spark, sf_dir, "lineitem")

    def _report(key: str) -> DataFrame:
        per_key = li.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        return per_key.agg(
            F.lit(key).alias("key_col"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.round(
                F.sum(F.col("cnt").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cnt"),
            F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_cnt"),
            F.round(
                F.max("cnt")
                / (
                    F.sum(F.col("cnt").cast("decimal(27,6)")).cast("double")
                    / F.count(F.lit(1))
                ),
                6,
            ).alias("skew_ratio"),
        )

    return _report("l_partkey").unionByName(_report("l_suppkey")).unionByName(
        _report("l_orderkey")
    )


QUERIES = {
    "skew_salted_pricing_summary": skew_salted_pricing_summary,
    "skew_salted_join_orders": skew_salted_join_orders,
    "scale_approx_distinct": scale_approx_distinct,
    "scale_approx_percentiles": scale_approx_percentiles,
    "scale_exact_percentiles": scale_exact_percentiles,
    "scale_winsorized_stats": scale_winsorized_stats,
    "join_range_binned_volatility": join_range_binned_volatility,
    "scale_skew_diagnostics": scale_skew_diagnostics,
}

_SKEW_DIAG_ONE = """
        SELECT '{key}' AS key_col,
               COUNT(*) AS n_keys,
               MAX(cnt) AS max_cnt,
               ROUND(CAST(SUM(CAST(cnt AS DECIMAL(27,6))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_cnt,
               ROUND(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
               ROUND(MAX(cnt)
                     / (CAST(SUM(CAST(cnt AS DECIMAL(27,6))) AS DOUBLE)
                        / COUNT(*)), 6) AS skew_ratio
        FROM (SELECT {key}, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
"""

ORACLE_SQL = {
    "scale_skew_diagnostics": " UNION ALL ".join(
        _SKEW_DIAG_ONE.format(key=k)
        for k in ("l_partkey", "l_suppkey", "l_orderkey")
    ),
    "scale_winsorized_stats": """
        WITH pct AS (
          SELECT l_returnflag,
                 ROUND(quantile_cont(l_extendedprice, 0.01), 6) AS p01,
                 ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               COUNT(*) AS n_rows,
               ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                     / COUNT(*), 4) AS raw_mean,
               ROUND(CAST(SUM(CAST(GREATEST(p.p01, LEAST(p.p99, l.l_extendedprice))
                                   AS DECIMAL(27,6))) AS DOUBLE)
                     / COUNT(*), 4) AS winsorized_mean,
               MAX(p.p01) AS p01,
               MAX(p.p99) AS p99
        FROM lineitem l JOIN pct p ON l.l_returnflag = p.l_returnflag
        GROUP BY l.l_returnflag
    """,
    "scale_exact_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
               ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "join_range_binned_volatility": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1
        )
        SELECT g.day AS day, g.revenue AS revenue,
               ROUND(CAST(SUM(CAST(g2.revenue AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*), 6) AS avg_rev_60d
        FROM daily g JOIN daily g2
          ON g2.day >= g.day - INTERVAL 59 DAY AND g2.day <= g.day
        GROUP BY g.day, g.revenue
        HAVING g.revenue > 1.5 * ROUND(CAST(SUM(CAST(g2.revenue AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*), 6)
    """,
    "skew_salted_pricing_summary": """
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n_rows,
               CAST(MAX(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "skew_salted_join_orders": """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
}


def scale_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the two-pass sketch-then-verify pattern: pass
    1 finds CANDIDATE frequent part keys with ``freqItems`` (Karp-
    Papadimitriou-Shenker misra-gries-style streaming summary — a
    superset of every item above the support threshold, O(1/support)
    driver state, one scan); pass 2 exact-counts ONLY the candidates
    (broadcast semi-join, one scan + a tiny aggregate) and keeps those
    at/above the threshold. The verify pass makes the approximate
    stage EXACT — same philosophy as LSH-then-verify dedup — so the
    query is oracle-backed even though pass 1 is a sketch: false
    positives are filtered by real counts, and the KPS summary
    guarantees no false negatives at support ≥ threshold.

    At 100 TB this is the only sane global top-frequency plan: a full
    groupBy on a high-cardinality key shuffles everything; this
    shuffles only the candidate subset. Plan-build runs exactly ONE
    action — the pass-1 sketch scan (that is the algorithm); the
    row-count threshold is folded into pass 2 as a broadcast scalar so
    the verify pass computes the total and the candidate counts in the
    same plan rather than paying a third scan."""
    li = _t(spark, sf_dir, "lineitem")
    # pass 1 (the one plan-build action): KPS/Misra-Gries candidate
    # sketch. Driver state is bounded by construction at ≤ 1/support
    # items; the check pins that contract so a support change cannot
    # silently turn this into an unbounded collect. A runtime contract,
    # not a debug assert: must survive `python -O`.
    support = 0.0004
    cand_rows = li.select("l_partkey").freqItems(
        ["l_partkey"], support=support
    ).first()[0]
    if len(cand_rows) > int(1 / support) + 1:
        raise ValueError(
            f"freqItems returned {len(cand_rows)} items — above the "
            f"1/support={int(1 / support)} KPS state bound"
        )
    cand = spark.createDataFrame(
        [(int(x),) for x in cand_rows], "l_partkey long"
    )
    # pass 2: exact recount of candidates only; the 0.055%-of-rows
    # threshold (above the per-part mean on this near-uniform testdata,
    # so the result is the genuine upper tail; the sketch support sits
    # safely BELOW it, so the KPS superset guarantee covers every
    # qualifying key) joins in as a 1-row broadcast computed in the
    # same plan. FLOOR on both engines (the oracle mirrors it) — int()
    # truncation vs DuckDB's round-to-nearest BIGINT cast disagreed on
    # fractional parts ≥ .5.
    total = li.agg(F.count(F.lit(1)).alias("_total"))
    return (
        li.join(F.broadcast(cand), "l_partkey", "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("n_rows")
            >= F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.col("_total") * F.lit(0.00055)).cast("long"),
            )
        )
        .select("l_partkey", "n_rows")
    )


QUERIES.update(
    {
        "scale_heavy_hitters": scale_heavy_hitters,
        "scale_hll_mergeable_distinct": scale_hll_mergeable_distinct,
    }
)

ORACLE_SQL.update(
    {
        # exact heavy hitters: the sketch stage is a provable superset,
        # the verify stage exact — so the result equals the direct form
        "scale_heavy_hitters": """
        SELECT l_partkey, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(*) >= GREATEST(1, CAST(FLOOR(
          (SELECT COUNT(*) FROM lineitem) * 0.00055) AS BIGINT))
    """,
    }
)


def scale_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-ZORDER-style layout drive: lineitem is rewritten
    clustered by the Morton code of (l_orderkey, l_partkey), then a
    conjunctive box predicate on BOTH keys reads the clustered copy
    and aggregates. The box is computed from the key ranges in exact
    integer arithmetic (min + span div 4 .. + span div 16), so the
    DuckDB oracle replays the identical filter over the original
    parquet — the z-rewrite must be a pure re-layout (any lost or
    duplicated row breaks the hash). The pruning effect itself
    (matches concentrate in few files vs. a hash layout touching all
    of them) is pinned by tests/test_training_ops.py; at cluster scale
    the same footer stats drive Delta/Iceberg file skipping.

    EAGER: writes the clustered copy at construction (plan-linted via
    its own test, like the other construction-time writers)."""
    import shutil
    import tempfile

    from market_data_pipeline_databricks_spark.operators.zorder import (
        write_zordered,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    )
    out_dir = tempfile.mkdtemp(prefix="zorder_li_")
    try:
        write_zordered(li, out_dir, "l_orderkey", "l_partkey", n_files=32)
        z = spark.read.parquet(out_dir)
        b = li.agg(
            F.min("l_orderkey").alias("o_lo"),
            F.max("l_orderkey").alias("o_hi"),
            F.min("l_partkey").alias("p_lo"),
            F.max("l_partkey").alias("p_hi"),
        )

        def boxed_agg(df: DataFrame) -> DataFrame:
            boxed = df.crossJoin(F.broadcast(b)).filter(
                F.col("l_orderkey").between(
                    F.col("o_lo") + F.expr("(o_hi - o_lo) div 4"),
                    F.col("o_lo")
                    + F.expr("(o_hi - o_lo) div 4 + (o_hi - o_lo) div 16"),
                )
                & F.col("l_partkey").between(
                    F.col("p_lo") + F.expr("(p_hi - p_lo) div 4"),
                    F.col("p_lo")
                    + F.expr("(p_hi - p_lo) div 4 + (p_hi - p_lo) div 16"),
                )
            )
            return boxed.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col("l_extendedprice").cast("decimal(27,2)"))
                .cast("decimal(27,2)")
                .cast("double")
                .alias("sum_price"),
                F.sum(F.col("l_quantity").cast("decimal(27,2)"))
                .cast("decimal(27,2)")
                .cast("double")
                .alias("sum_qty"),
            )

        return checked_lazy(
            boxed_agg(z), boxed_agg(li), "scale_zorder_clustering"
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


QUERIES.update({"scale_zorder_clustering": scale_zorder_clustering})

ORACLE_SQL.update(
    {
        "scale_zorder_clustering": """
WITH b AS (
  SELECT MIN(l_orderkey) AS o_lo, MAX(l_orderkey) AS o_hi,
         MIN(l_partkey) AS p_lo, MAX(l_partkey) AS p_hi
  FROM lineitem
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DECIMAL(27,2))
            AS DOUBLE) AS sum_price,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DECIMAL(27,2))
            AS DOUBLE) AS sum_qty
FROM lineitem, b
WHERE l_orderkey BETWEEN o_lo + (o_hi - o_lo) // 4
                     AND o_lo + (o_hi - o_lo) // 4 + (o_hi - o_lo) // 16
  AND l_partkey BETWEEN p_lo + (p_hi - p_lo) // 4
                    AND p_lo + (p_hi - p_lo) // 4 + (p_hi - p_lo) // 16
"""
    }
)


def scale_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located fact⋈fact join: orders and lineitem are
    written as catalog tables BUCKETED by the join key (8 buckets,
    sorted), so Catalyst plans the sort-merge join with NO Exchange on
    either side — at 100 TB the shuffle of both fact sides is the
    dominant join cost, and bucketing removes it at write time. The
    no-shuffle property is enforced INSIDE the query (plan_has_shuffle
    raises if the bucketed join ever plans an Exchange — a silent
    regression would invalidate the scale claim), and the aggregate
    must hash-match the oracle's plain join. EAGER (saveAsTable at
    construction; tables are nonce-named and dropped afterward)."""
    import uuid

    from market_data_pipeline_databricks_spark.sources.bucketing import (
        bucketed_join,
        plan_has_shuffle,
        write_bucketed,
    )

    nonce = uuid.uuid4().hex[:8]
    lt, rt = f"b_orders_{nonce}", f"b_lineitem_{nonce}"
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
    )
    try:
        write_bucketed(orders, lt, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        write_bucketed(li, rt, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        j = bucketed_join(spark, lt, rt, ["o_orderkey"])
        if plan_has_shuffle(j):
            raise RuntimeError(
                "bucketed join planned a shuffle Exchange — the "
                "co-located-join contract regressed"
            )

        def agg(df: DataFrame) -> DataFrame:
            return df.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum("price")
                .cast("decimal(27,2)")
                .cast("double")
                .alias("sum_price"),
            )

        return checked_lazy(
            agg(j),
            agg(orders.join(li, "o_orderkey")),
            "scale_bucketed_join",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


QUERIES.update({"scale_bucketed_join": scale_bucketed_join})

ORACLE_SQL.update(
    {
        "scale_bucketed_join": """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(27,2))
            AS DOUBLE) AS sum_price
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o_orderpriority
"""
    }
)


def scale_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning drive: orders lands YEAR-partitioned
    in a throwaway warehouse, then joins a small filtered dimension
    (the odd order-years) on the partition column. Catalyst must plan
    the fact scan with a ``dynamicpruningexpression`` partition filter
    — the runtime mechanism that lets a 100-TB partitioned fact table
    skip every partition the dimension filter excludes WITHOUT a
    static predicate (the star-schema scale feature Spark ships for
    exactly this shape). The DPP property is enforced IN-QUERY (like
    the bucketed no-Exchange contract): if the planned scan carries no
    dynamic pruning filter the query raises instead of silently
    degrading to a full scan. The DuckDB oracle replays the join as a
    plain year-parity filter, so hash equality also proves the pruned
    scan lost no rows. EAGER (writes the partitioned warehouse at
    construction; returns the lazy parquet-rooted twin, with the
    drive's result asserted equal in-query — plans/_eager.py:
    checked_lazy)."""
    import shutil
    import tempfile

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
        F.year("o_orderdate").alias("p_year"),
    )
    wh = tempfile.mkdtemp(prefix="dpp_wh_")
    try:
        orders.write.partitionBy("p_year").parquet(f"{wh}/orders")
        fact = spark.read.parquet(f"{wh}/orders")
        dim = (
            orders.select("p_year")
            .distinct()
            .filter(F.col("p_year") % 2 == 1)
            .select(F.col("p_year").alias("dim_year"))
        )
        joined = fact.join(
            F.broadcast(dim), fact.p_year == dim.dim_year
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "dynamicpruning" not in plan.lower():
            raise RuntimeError(
                "partitioned fact scan planned WITHOUT a dynamic "
                "partition pruning filter — the DPP contract regressed "
                "(full scan at 100 TB)"
            )

        def agg(df: DataFrame) -> DataFrame:
            return df.groupBy("p_year").agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("o_totalprice")
                .cast("decimal(27,2)")
                .cast("double")
                .alias("sum_price"),
            )

        return checked_lazy(
            agg(joined),
            agg(orders.filter(F.col("p_year") % 2 == 1)),
            "scale_dynamic_partition_pruning",
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


QUERIES.update(
    {"scale_dynamic_partition_pruning": scale_dynamic_partition_pruning}
)

ORACLE_SQL.update(
    {
        "scale_dynamic_partition_pruning": """
SELECT CAST(year(o_orderdate) AS INT) AS p_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(27,2))
            AS DOUBLE) AS sum_price
FROM orders
WHERE year(o_orderdate) % 2 = 1
GROUP BY 1
"""
    }
)


def scale_global_rank_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL row ranking WITHOUT the single-partition window — the
    two-pass technique for the classic Spark scale killer: a
    ``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY plans
    every row through ONE task (Catalyst inserts a SinglePartition
    Exchange), which at 100 TB is an executor-OOM, not a query. The
    distributed equivalent:

    1. range-repartition on the total order (price DESC, key — the
       unique tie-break makes the order TOTAL, so range boundaries
       cannot split equal rows and the result is invariant to the
       sampled boundary placement);
    2. per-partition local ROW_NUMBER (spark_partition_id is the
       window key — range partition ids are monotone with the global
       order, and AQE coalescing merges only ADJACENT ranges so the
       monotonicity survives);
    3. per-partition counts → cumulative offsets (one row per
       partition — a driver-trivial frame) broadcast back;
       global_rank = offset + local_rank.

    The oracle IS the single-partition form (DuckDB sorts centrally),
    so hash equality proves the stitched ranks equal the global sort
    exactly — every row, not just the top-k (``sort_topk_orders``
    covers the TakeOrdered shape; this covers full-table ranking, the
    export/backfill shape where every row needs its position).

    Delegates to the factored operator
    (operators/ranking.py:two_pass_key_rank, round 12) — same plan,
    now shared with the per-key and streaming rank paths."""
    from market_data_pipeline_databricks_spark.operators.ranking import (
        two_pass_key_rank,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        # decimal(12,2) stays INTERNAL (exact, engine-stable sort key);
        # the final projection casts to double — DecimalType output
        # columns are driver-hash hazards (VERDICT r10)
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
    )
    ranked = two_pass_key_rank(
        orders,
        [],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        "global_rank",
    )
    return ranked.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "global_rank",
    )


QUERIES.update({"scale_global_rank_twopass": scale_global_rank_twopass})

ORACLE_SQL.update(
    {
        "scale_global_rank_twopass": """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(ROW_NUMBER() OVER (
         ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey
       ) AS BIGINT) AS global_rank
FROM orders
"""
    }
)


def scale_salted_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-KEY windowed rank over EXTREME key skew without a hot
    partition — the windowed complement of ``skew_salted_join_orders``
    (VERDICT r10 task 7). ``ROW_NUMBER() OVER (PARTITION BY
    l_returnflag ORDER BY ...)`` on lineitem has only 3 key values, so
    WindowExec lands ~1/3 of the table in EACH task — at 100 TB that is
    a straggler/OOM, the same class of killer as the global rank's
    SinglePartition exchange. The distributed two-pass form (the
    per-key generalization of ``scale_global_rank_twopass``):

    1. range-repartition on (key, order...) — the order is made TOTAL
       by the (l_orderkey, l_linenumber) PK tie-break, so range
       boundaries cannot split equal rows, and each key's rows occupy
       a CONTIGUOUS ascending pid range;
    2. local ROW_NUMBER per (pid, key) — every window partition is one
       range-split's worth of one key, never the whole key;
    3. per-(key, pid) counts → per-key cumulative offsets over pids
       (a |keys| x |parts| frame — driver-trivial) broadcast back;
       key_rank = offset + local rank.

    The oracle IS the single-hot-partition form (DuckDB windows
    centrally), so hash equality proves the stitched per-key ranks
    equal the skewed window exactly, every row.

    Delegates to the factored operator
    (operators/ranking.py:two_pass_key_rank, round 12) — same plan,
    now shared with the global and streaming rank paths."""
    from market_data_pipeline_databricks_spark.operators.ranking import (
        two_pass_key_rank,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"
    )
    ranked = two_pass_key_rank(
        li,
        ["l_returnflag"],
        [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        "key_rank",
    )
    return ranked.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "key_rank"
    )


def scale_layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-layout governance drive for sources/layout.py (VERDICT r10
    task 7): lineitem is rewritten by :func:`zorder_write` — the
    QUANTILE-BUCKETED Morton layout (one multi-column approxQuantile
    sketch pass, fold-based bucket index, shift-chain interleave,
    repartitionByRange into n_files z-contiguous files) — and a
    conjunctive box predicate on both layout keys reads the governed
    copy back. Differs from ``scale_zorder_clustering`` (operators/
    zorder.py: raw-integer-key interleave) in exercising the
    value-distribution-aware path a layout GOVERNANCE job runs on
    arbitrary (skewed, non-integer) columns at 100 TB. The rewrite must
    be a pure re-layout: checked_lazy pins read-back == original, and
    the DuckDB oracle replays the identical filter over the source
    parquet. The pruning effect itself (tight per-file min/max footers)
    is pinned by tests/test_layout.py. EAGER (writes the governed copy
    at construction; returns the lazy parquet-rooted twin)."""
    import shutil
    import tempfile

    from market_data_pipeline_databricks_spark.sources.layout import (
        zorder_write,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
    )
    out_dir = tempfile.mkdtemp(prefix="layout_z_")
    try:
        # bits=6 (64 quantile buckets/dim): granularity is bounded by
        # n_files=16 z-contiguous ranges, so finer bucketing buys no
        # extra pruning — it only grows the approxQuantile prob list
        zorder_write(li, out_dir, ["l_orderkey", "l_partkey"], n_files=16, bits=6)
        back = spark.read.parquet(out_dir)

        b = li.agg(
            F.min("l_orderkey").alias("o_lo"),
            F.max("l_orderkey").alias("o_hi"),
            F.min("l_partkey").alias("p_lo"),
            F.max("l_partkey").alias("p_hi"),
        )

        def boxed_agg(df: DataFrame) -> DataFrame:
            boxed = df.crossJoin(F.broadcast(b)).filter(
                F.col("l_orderkey").between(
                    F.col("o_lo") + F.expr("(o_hi - o_lo) div 2"),
                    F.col("o_lo")
                    + F.expr("(o_hi - o_lo) div 2 + (o_hi - o_lo) div 8"),
                )
                & F.col("l_partkey").between(
                    F.col("p_lo") + F.expr("(p_hi - p_lo) div 2"),
                    F.col("p_lo")
                    + F.expr("(p_hi - p_lo) div 2 + (p_hi - p_lo) div 8"),
                )
            )
            return boxed.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("price")
                .cast("decimal(27,2)")
                .cast("double")
                .alias("sum_price"),
            )

        return checked_lazy(
            boxed_agg(back), boxed_agg(li), "scale_layout_zorder_pruning"
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


QUERIES.update(
    {
        "scale_salted_window_rank": scale_salted_window_rank,
        "scale_layout_zorder_pruning": scale_layout_zorder_pruning,
    }
)

ORACLE_SQL.update(
    {
        "scale_salted_window_rank": """
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY l_returnflag
         ORDER BY l_shipdate, l_orderkey, l_linenumber
       ) AS BIGINT) AS key_rank
FROM lineitem
""",
        "scale_layout_zorder_pruning": """
WITH b AS (
  SELECT MIN(l_orderkey) AS o_lo, MAX(l_orderkey) AS o_hi,
         MIN(l_partkey) AS p_lo, MAX(l_partkey) AS p_hi
  FROM lineitem
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
            AS DECIMAL(27,2)) AS DOUBLE) AS sum_price
FROM lineitem, b
WHERE l_orderkey BETWEEN o_lo + (o_hi - o_lo) // 2
                     AND o_lo + (o_hi - o_lo) // 2 + (o_hi - o_lo) // 8
  AND l_partkey BETWEEN p_lo + (p_hi - p_lo) // 2
                    AND p_lo + (p_hi - p_lo) // 2 + (p_hi - p_lo) // 8
""",
    }
)
