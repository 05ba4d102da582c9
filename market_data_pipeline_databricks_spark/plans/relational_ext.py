"""Extended relational shapes: join breadth (semi / multi-way TPC-H
Q3) and multi-level aggregation (ROLLUP / CUBE) — surfaces Spark gives
for free that round out the analyst SQL product beyond the reference's
own corpus. All fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.plans.relational import _dsum, _t


def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that have ordered — the
    complement of join_anti_customers_without_orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def join_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem) with
    selective filters on both sides + grouped revenue + top-k.

    Scale: filters push into all three scans; customer (filtered) is
    broadcast; lineitem shuffles once on orderkey. Top-k via
    TakeOrderedAndProject — no global sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        # DATE, not the parquet's timestamp_ntz — NTZ output columns
        # are driver-hash hazards (VERDICT r10 / tools/lint_schemas.py)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag
    subtotal, and grand total in one pass (partial-agg friendly)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def agg_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderpriority, orderstatus): all 4 grouping
    combinations in one shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )





def set_except_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT set operations (U-family breadth): customers
    who ordered in the first half of the data but not the second
    (EXCEPT), and in both halves (INTERSECT), labeled and unioned."""
    o = _t(spark, sf_dir, "orders")
    mid = F.lit("1995-06-01").cast("date")
    early = o.filter(F.col("o_orderdate") < mid).select("o_custkey").distinct()
    late = o.filter(F.col("o_orderdate") >= mid).select("o_custkey").distinct()
    churned = early.exceptAll(late).withColumn("cohort", F.lit("churned"))
    retained = early.intersectAll(late).withColumn("cohort", F.lit("retained"))
    return (
        churned.unionByName(retained)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )

def unpivot_part_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): per-brand wide aggregates (min/avg/max retail
    price) melted to (brand, metric, metric_value) long format — the
    inverse of pivot_qty_by_status. ``stack`` is a Generate (row
    multiplier) applied AFTER the aggregation, so the wide table it
    melts is |brands| rows: no data-sized fan-out, one shuffle total."""
    p = _t(spark, sf_dir, "part")
    # AVG numerator runs through an exact decimal sum (same discipline
    # as sum_price in this file): a raw double SUM is partition-order
    # dependent, so the rounded value would rely on ROUND(,2) absorbing
    # accumulation noise instead of being order-independent by
    # construction (round-3 advice).
    wide = p.groupBy("p_brand").agg(
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(
            F.sum(F.col("p_retailprice").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
    )
    return wide.select(
        "p_brand",
        F.expr(
            "stack(3, 'min_price', min_price, 'avg_price', avg_price,"
            " 'max_price', max_price) AS (metric, metric_value)"
        ),
    )


def agg_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((returnflag), (linestatus), ()) — asymmetric
    multi-level aggregates in one pass, a shape ROLLUP/CUBE cannot
    express (they would add the (flag, status) cell). Driven through
    the SQL surface on a staged temp view (S4), Expand + single
    exchange underneath."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM li_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER JOIN — the classic
    source-vs-target diff a data platform runs after a backfill: the
    same customer revenue aggregate computed on two halves of the
    order history, full-outer-joined on the key, each customer
    classified new / churned / changed / stable.

    Scale: both sides pre-aggregate to |customers| rows BEFORE the
    join (partial aggs absorb the fact-table volume), and the join key
    is the grouping key, so both inputs arrive already hash-partitioned
    on o_custkey — the full outer join itself adds no exchange. Sums
    run through decimals so the change classification compares exact
    bits, not accumulation noise.

    The two sides deliberately stay separate scans: the operator
    models reconciling two DISTINCT snapshot tables (source vs target
    after a backfill). Only this test fixture derives both from one
    table — fusing them into one conditional-aggregate scan would
    optimize the fixture, not the operator (the single-scan
    conditional-count shape is covered by agg_conditional_counts)."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1995-06-01").cast("date")

    def snap(pred):
        return (
            o.filter(pred)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                _dsum(F.col("o_totalprice")).alias("revenue"),
            )
        )

    early = snap(F.col("o_orderdate") < cutoff).select(
        F.col("o_custkey"),
        F.col("n_orders").alias("n_early"),
        F.col("revenue").alias("rev_early"),
    )
    late = snap(F.col("o_orderdate") >= cutoff).select(
        F.col("o_custkey"),
        F.col("n_orders").alias("n_late"),
        F.col("revenue").alias("rev_late"),
    )
    j = early.join(late, "o_custkey", "full_outer")
    status = (
        F.when(F.col("n_early").isNull(), "new")
        .when(F.col("n_late").isNull(), "churned")
        .when(F.col("rev_late") > F.col("rev_early"), "grew")
        .otherwise("shrank")
    )
    return j.select(
        "o_custkey",
        F.coalesce("n_early", F.lit(0)).cast("long").alias("n_early"),
        F.coalesce("n_late", F.lit(0)).cast("long").alias("n_late"),
        F.round(F.coalesce("rev_early", F.lit(0.0)), 2).alias("rev_early"),
        F.round(F.coalesce("rev_late", F.lit(0.0)), 2).alias("rev_late"),
        status.alias("status"),
    )


def join_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a date window having at least one
    RETURNED lineitem (correlated EXISTS; this testdata carries
    l_returnflag, not commit/receipt dates — reference Q4 uses the
    late-delivery predicate, same plan shape), counted by priority.
    The EXISTS compiles to a left-semi join — the lineitem side never
    materializes per-order, and both scans carry pushed-down
    predicates."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("date"))
    )
    returned = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def agg_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count —
    LEFT OUTER join (customers with zero orders must appear at
    c_count = 0) into an aggregate-of-aggregate. Two shuffles by
    construction (per-customer count, then per-count histogram); the
    second input is |customers| rows, so the expensive exchange is
    only the first. The excluded-orders predicate (Q13 excludes
    comment-matched orders; this testdata has no o_comment, so
    low-priority orders stand in) lives on the join's right side —
    exclusion must NOT drop zero-order customers, which is the whole
    point of the left join."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def agg_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue and
    of the global total — the share-of-total analytic every BI layer
    ships. The base is the broadcast star join collapsed to |nations|
    rows; both denominators are window sums OVER THAT AGGREGATE (25
    rows), so the two extra window passes cost nothing at any scale —
    the classic mistake this query exists to demonstrate against is
    windowing the fact table instead of the aggregate."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # The per-nation revenue stays DECIMAL through the window sums so
    # the denominators are order-exact too (a double window sum over
    # the 25-row aggregate would re-introduce accumulation-order
    # dependence in the last ulp of the share).
    base = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).alias(
                "rev_dec"
            )
        )
    )
    wr = Window.partitionBy("r_name")
    # single-partition window: bounded — region x nation rollup (25 rows)
    wg = Window.partitionBy()
    return base.select(
        "r_name",
        "n_name",
        F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(wr).cast("double"),
            6,
        ).alias("region_share"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(wg).cast("double"),
            6,
        ).alias("global_share"),
    )


def window_gapfill_daily_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine densification + forward fill: the sparse per-supplier
    daily close series becomes a dense calendar (every day between the
    supplier's first and last observation), gaps carrying the last
    known close — the standard prep before any fixed-stride window
    math on irregular series (the reference's staleness check is the
    detection side of the same problem; this is the repair side).

    Plan: the spine explodes from each supplier's (min, max) day pair —
    O(days) rows per key from an O(keys) aggregate, never a cartesian
    against a calendar table — and the carry-forward is
    last_value(IGNORE NULLS) over one suppkey exchange. Restricted to
    suppkey ≤ 5 to keep the driver-checked result compact; the plan is
    key-count-independent."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    daily = li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(F.max("l_extendedprice").alias("close"))
    spine = (
        daily.groupBy("suppkey")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "suppkey",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("suppkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["suppkey", "day"], "left")
        .withColumn("filled_close", F.last("close", ignorenulls=True).over(w))
        .select(
            "suppkey",
            "day",
            F.col("close").isNotNull().alias("observed"),
            F.round("filled_close", 6).alias("filled_close"),
        )
    )


def agg_segment_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value quantiles per market segment — the
    percentile-over-a-join shape (scale_exact_percentiles runs on a
    bare fact column; this one first routes orders through the
    customer dimension). Median and p90 with linear interpolation,
    identical formula on both engines.

    Scale: customer is the AQE-chosen build side; the percentile
    buffers one segment's order values per group — bounded at 5
    segments here; on unbounded group counts the sketch twin
    (scale_approx_percentiles) is the default path."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def quality_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table expectation suite — the reference's append-only
    data_quality_checks audit table (04_data_quality_checks.py DQ rows:
    one row per check per run, PASS/FAIL + violation count) widened
    from single-table OHLC rules to warehouse-level contracts:

    - referential integrity: lineitem.l_orderkey → orders,
      orders.o_custkey → customer (anti-join counts);
    - domain ranges: non-positive prices/quantities, discount outside
      [0, 1], OHLC-style l_extendedprice sanity;
    - nullability: keys that must never be NULL.

    Scale: each referential check is a left-anti join on the foreign
    key (one shuffle each, AQE-broadcast at small scale); the range
    and null checks are conditional counts fused into ONE aggregation
    pass per table. All check streams union into the audit schema
    (check_name, n_violations, status)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")

    def check_row(df: DataFrame, name: str) -> DataFrame:
        n = df.agg(F.count(F.lit(1)).alias("n_violations"))
        return n.select(
            F.lit(name).alias("check_name"),
            "n_violations",
            F.when(F.col("n_violations") == 0, "PASS")
            .otherwise("FAIL")
            .alias("status"),
        )

    orphan_lines = li.join(
        o.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    orphan_orders = o.join(
        c.select("c_custkey"),
        o.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    li_rules = li.agg(
        F.sum(
            F.when((F.col("l_extendedprice") <= 0), 1).otherwise(0)
        ).alias("bad_price"),
        F.sum(F.when((F.col("l_quantity") <= 0), 1).otherwise(0)).alias(
            "bad_qty"
        ),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        ).alias("bad_discount"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias(
            "null_orderkey"
        ),
    )

    def unpivot_rule(colname: str, check: str) -> DataFrame:
        return li_rules.select(
            F.lit(check).alias("check_name"),
            F.col(colname).alias("n_violations"),
            F.when(F.col(colname) == 0, "PASS").otherwise("FAIL").alias(
                "status"
            ),
        )

    return (
        check_row(orphan_lines, "ri_lineitem_orders")
        .unionByName(check_row(orphan_orders, "ri_orders_customer"))
        .unionByName(unpivot_rule("bad_price", "range_positive_price"))
        .unionByName(unpivot_rule("bad_qty", "range_positive_qty"))
        .unionByName(unpivot_rule("bad_discount", "range_discount_unit"))
        .unionByName(unpivot_rule("null_orderkey", "notnull_l_orderkey"))
    )


def agg_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: global scalar aggregate under a triple range
    predicate (date year, discount band, quantity cap) — the purest
    scan-bound query in the suite; everything must reach the parquet
    scan as pushed filters and the aggregate is a one-row map-side
    collapse (no meaningful shuffle at any scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias(
                "forecast_revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def agg_q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — a
    conditional-aggregate percentage over the lineitem ⋈ part join,
    computed in ONE pass (no second scan for the denominator).

    Scale: the month filter pushes into lineitem; part is the build
    side AQE picks (it scales with SF, so no forced hint); the ratio
    divides two decimal-exact doubles and floor-truncates (half-way
    rounding is engine-divergent)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        _dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)), 6)
        .alias("promo_revenue"),
        _dsum(rev, 6).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (
            F.floor(
                F.lit(100.0)
                * F.col("promo_revenue")
                / F.col("total_revenue")
                * 1e6
            )
            / 1e6
        ).alias("promo_pct"),
    )


def join_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum quarterly revenue — the revenue 'view' is aggregated
    once and reused for both the ranking and the scalar max (Q15's
    CREATE VIEW discipline as a shared DataFrame, not a re-scan).

    Scale: one orderkey-free aggregate on l_suppkey (single fact
    shuffle); the 1-row max broadcasts by cross join; supplier join is
    AQE-chosen. Returning ALL argmax suppliers (not LIMIT 1) keeps the
    result deterministic under revenue ties by construction."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
    )


def join_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders of less than 20% of a
    part's average order quantity, for one brand — the classic
    correlated scalar aggregate (AVG per part) decorrelated into an
    aggregate-then-join-back.

    Scale: the per-part average is computed over ONLY the brand's
    lineitems (the correlation's domain), so the join-back side is
    tiny and AQE broadcasts it; lineitem shuffles once on partkey for
    the aggregate. The weekly-average divisor (7.0) keeps the
    reference query's units."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        brand_li.join(avg_qty, F.col("l_partkey") == F.col("agg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.floor(
                    F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
                    .cast("double")
                    / 7.0
                    * 1e6
                )
                / 1e6
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def join_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size
    band, quantity band) conjunctions — the disjunctive-predicate
    join. The OR cannot become a join key, but each disjunct's part
    side is independently prunable; Spark evaluates the disjunction
    post-join while pushing the union of part-side bounds into the
    part scan.

    Scale: one partkey join (AQE-chosen build side); the predicate is
    pure codegen — no UDF, no explode."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    d1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(d1 | d2 | d3).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


def join_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by supplier nation for orders where the
    CUSTOMER and the SUPPLIER share a nation (the c_nationkey =
    s_nationkey constraint is the distinguishing edge — it closes a
    cycle in the join graph, so the optimizer must pick where to apply
    it), restricted to one region and one order year.

    Scale: nation/region broadcast (bounded); the date filter pushes
    into the orders scan; customer and supplier joins are AQE-chosen.
    The nation-equality closes as a post-join filter on two already
    joined columns — no extra shuffle."""
    nat = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nat = nat.join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(asian_nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


def join_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter — selective filters on both fact scans, a grouped
    multi-column aggregate, and a deterministic top-k.

    Scale: the R-flag filter pushes into the lineitem scan and the
    quarter filter into orders; the group key carries the customer
    attributes (no second join-back needed); top-k compiles to
    TakeOrderedAndProject with c_custkey as the tiebreak."""
    c = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def join_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line-status, conditional counts of
    critical vs non-critical order priority for one ship year (this
    schema has no l_shipmode, so l_linestatus is the grouping stand-in
    — same conditional-count-over-join plan problem).

    Scale: the ship-date filter pushes into the lineitem scan; the
    join shuffles on orderkey; both counts come from one conditional
    aggregation pass."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def join_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — lineitem bridged to a supplier nation on one side and
    a customer nation (through orders) on the other, keeping only the
    two directed pairs.

    Scale: only `nation` (25 rows, bounded) carries a broadcast hint.
    Supplier and customer grow linearly with SF, so their nation
    filter (2/25 of rows) is applied early but the join strategy is
    left to AQE — at test scale it broadcasts, at 100 TB it degrades
    to shuffle joins on suppkey/custkey without replanning the query.
    The pair predicate is two equi-joins plus one inequality filter,
    never an OR-join (which would defeat hash join selection)."""
    pair = ("NATION_1", "NATION_2")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(*pair))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(*pair))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold
    into one region, by order year — a conditional-aggregate ratio
    over a five-table star.

    Scale: the share is numerator/denominator of two decimal-exact
    sums computed in ONE aggregation pass (a conditional sum, not a
    second scan or a self-join). Nation/region hints are bounded
    (25/5 rows); part, supplier, customer joins are AQE-chosen since
    all three scale with SF. The p_type filter pushes into the part
    scan and prunes the lineitem join early."""
    nat = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dsum(
                F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("nation_volume"),
            _dsum(vol, 6).alias("total_volume"),
        )
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias(
            "mkt_share"
        ),
    )


def join_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, joined back to orders + customer, top-100 by price.

    Scale: the HAVING aggregate is the only full-fact shuffle (one
    pass on l_orderkey, map-side partial sums); the surviving key set
    is tiny, so AQE broadcasts it into the orders join rather than
    shuffling the orders table — the classic agg-then-semi-join-back
    pattern. Top-k via TakeOrderedAndProject with a unique
    (totalprice, orderdate, orderkey) sort key — no global sort, and
    the LIMIT is deterministic under ties."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )


def join_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE returned-flag
    supplier on a finished multi-supplier order (this testdata carries
    l_returnflag, not commit/receipt dates — 'R' stands in for the
    late-delivery predicate, same correlated EXISTS / NOT EXISTS plan
    problem).

    Scale: the reference formulation is EXISTS(other supplier) AND
    NOT EXISTS(other supplier with R) — two extra correlated scans of
    lineitem. Here both quantifiers collapse into ONE auxiliary
    per-order aggregate: n_supp = COUNT(DISTINCT l_suppkey) and
    n_supp_r = COUNT(DISTINCT l_suppkey WHERE R); for an R-row of
    supplier s, EXISTS-other ⇔ n_supp ≥ 2 and NOT-EXISTS-other-R ⇔
    n_supp_r = 1. Lineitem is scanned twice total (R rows + the
    aggregate) instead of four times, and both sides shuffle once on
    l_orderkey. The two distinct counts are written as a CASCADED
    aggregate (collapse to (order, supplier, has_r) rows first, then
    count per order) rather than two countDistinct calls — a double
    countDistinct compiles to an Expand that duplicates every lineitem
    row before the shuffle, while the cascade's first level
    partial-aggregates down to distinct (order, supplier) pairs
    map-side. The oracle SQL keeps the literal EXISTS/NOT EXISTS
    form, so the gate also proves the rewrite's equivalence."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    f_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    per_supp = li.groupBy(
        F.col("l_orderkey").alias("agg_orderkey"),
        F.col("l_suppkey").alias("agg_suppkey"),
    ).agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "has_r"
        )
    )
    per_order = per_supp.groupBy("agg_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_supp_r"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").join(
        f_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(per_order, F.col("l_orderkey") == F.col("agg_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_supp_r") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


def join_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no recent orders (the schema has no c_phone, so 'no orders
    since 2000-01-01' stands in for the no-orders-at-all predicate —
    same scalar-subquery + anti-join plan problem), rolled up by
    market segment.

    Scale: the average is a 1-row decimal-exact aggregate broadcast by
    a cross join (bounded by construction); the NOT EXISTS is a
    left-anti join on custkey against the date-filtered orders scan —
    filter pushed down, one shuffle, no correlated re-scan. The
    threshold is computed once as exact-decimal sum / count so both
    engines derive the same double bits (order-independent)."""
    cust = _t(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        pos.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pos.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def agg_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer Recency (days since last order,
    anchored at the corpus's own max order date), Frequency (order
    count) and Monetary (decimal-exact total spend), bucketed by fixed
    business thresholds into named segments, then rolled up per
    segment — the classic warehouse customer-value report.

    Fixed-threshold buckets (not quantile buckets) keep the assignment
    scale-free and embarrassingly parallel: the only global state is
    the 1-row max-date anchor, which broadcasts; the per-customer
    grain shuffles once on o_custkey and the segment rollup is
    |segments| rows. Monetary means run through decimal sums."""
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency_d", F.datediff(F.col("anchor"), F.col("last_order")))
    )
    seg = (
        F.when((F.col("recency_d") <= 90) & (F.col("frequency") >= 8), "champion")
        .when(F.col("recency_d") <= 90, "recent")
        .when(F.col("frequency") >= 8, "loyal_lapsing")
        .when(F.col("recency_d") <= 365, "warm")
        .otherwise("hibernating")
    )
    return (
        per_cust.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("recency_d").cast("decimal(27,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_recency_d"),
            F.round(
                F.sum(F.col("frequency").cast("decimal(27,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_frequency"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
    )


def join_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: each
    customer's top-3 orders by value — the SQL-standard lateral form of
    top-N-per-group, accepted verbatim by Spark 4 (and by DuckDB, so
    the oracle runs the IDENTICAL text modulo the table reference).
    Catalyst decorrelates it into a window/rank plan — the same
    physical shape as the QUALIFY/rn<=k formulation — so the lateral
    surface costs nothing over the hand-written window. Inline
    ``parquet.`path``` table syntax keeps the query self-contained (no
    session-global temp views)."""
    return spark.sql(f"""
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM parquet.`{sf_dir}/customer.parquet` c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM parquet.`{sf_dir}/orders.parquet` o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 3
        ) t
    """)


def join_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region offering it at the MINIMUM cost — the classic correlated
    MIN scalar subquery whose correlation domain (region suppliers ×
    part) is itself a join. This testdata has no ``partsupp``, so the
    supply relation derives from ``lineitem``: a (partkey, suppkey)
    pair supplies a part at unit cost MIN(l_extendedprice /
    l_quantity) — same plan problem, schema-adapted like Q21's
    returnflag stand-in (reference shape: TPC-H Q2).

    Scale: the derived supply table aggregates lineitem ONCE on
    (partkey, suppkey) — one shuffle; the region-supplier dimension
    (supplier ⋈ nation ⋈ region) is bounded and broadcasts; the
    correlated MIN decorrelates into a per-part aggregate joined back
    on (partkey, cost). Cost equality across engines is safe: each
    unit cost is a single IEEE division and MIN *selects* one of those
    exact values (no accumulation), so the equality join is bit-exact
    by construction.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supply = li.filter(F.col("l_quantity") > 0).groupBy(
        "l_partkey", "l_suppkey"
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    nat = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.join(reg, nat.n_regionkey == reg.r_regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    region_supply = supply.join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    # Decorrelate the MIN as a WINDOW over partkey rather than an
    # aggregate-join-back: the join-back form consumes region_supply
    # twice, which re-derives the whole lineitem aggregation chain —
    # 2× fact scans at 100 TB. The window form reads lineitem ONCE
    # and adds only a partkey exchange over the already-aggregated
    # (small) supply frame.
    w = Window.partitionBy("p_partkey")
    return (
        region_supply.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("unit_cost"), 6).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


def join_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for
    parts matching a name substring — the widest TPC-H join tree
    (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders) with a computed
    per-line measure. No ``partsupp`` here, so supply cost is proxied
    as 60% of p_retailprice per unit (reference shape: TPC-H Q9).

    Scale: the part filter (substring containment) prunes the probe
    side before the join; part/supplier/nation broadcast; lineitem
    shuffles only for the orderkey join with orders, and the final
    (nation, year) rollup is partial-agg friendly. The profit sum
    runs through decimal so accumulation order cannot move the
    rounded result.
    """
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit, 6).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


def agg_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through ONE nation's
    suppliers exceeds a fixed fraction of that nation's total — the
    group-HAVING-against-global-scalar-subquery plan. Value is the
    lineitem revenue routed through the nation's suppliers (the
    partsupp value proxy; reference shape: TPC-H Q11).

    Scale: the nation's supplier list is bounded and broadcasts, so
    lineitem is filtered before its single shuffle on partkey; the
    global total is a second aggregate over the SAME filtered frame
    (Spark reuses the exchange under AQE), broadcast as one row.
    Decimal sums make the threshold comparison order-independent.
    """
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    routed = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    value = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        )
    )
    per_part = routed.groupBy("l_partkey").agg(value.alias("value_dec"))
    total = routed.agg((value * F.lit(0.001)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


def agg_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers can provide parts
    of each (brand, type, size) combination, excluding one brand, one
    type, sizes outside a fixed IN-list, and a NOT-IN supplier
    blacklist (negative account balance stands in for the 'complaints'
    comment scan; the part-supplier bridge derives from lineitem —
    reference shape: TPC-H Q16).

    Scale: lineitem first collapses to distinct (partkey, suppkey)
    pairs — a map-side-combinable dedup that is the only full-fact
    shuffle; the blacklist anti-join and the part-attribute join both
    broadcast. The single COUNT(DISTINCT) plans as a two-phase
    aggregate (no Expand, unlike a multi-distinct).
    """
    bridge = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    blacklist = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
    )
    return (
        bridge.join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


def join_q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved an outsized
    share of a filtered part family — the nested semi-join chain
    (supplier ⋉ (shipments ⋉ name-filtered parts) under a correlated
    threshold). The original's ps_availqty > ½·shipped test becomes
    'this supplier's 1996 shipped quantity of the part exceeds 1.5×
    the per-part average across suppliers' — the same
    correlated-aggregate-threshold semi-join (reference shape:
    TPC-H Q20).

    Scale: the part-name filter broadcasts; shipments aggregate once
    on (suppkey, partkey); the per-part average joins back on partkey
    (bounded, AQE-broadcast); the final supplier qualification is a
    left-semi join, so multi-part qualification cannot duplicate
    supplier rows. Decimal quantity sums keep the threshold exact.
    """
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("supp_qty")
        )
    )
    # Per-part average as a WINDOW over the aggregated shipped frame:
    # the aggregate-join-back form consumes `shipped` twice and
    # re-scans lineitem for each consumer — 2× fact scans at 100 TB.
    # The window reads lineitem once; the extra partkey exchange runs
    # over the already-aggregated (suppkey, partkey) frame only.
    w = Window.partitionBy("l_partkey")
    qualifying = (
        shipped.withColumn(
            "avg_qty",
            F.sum("supp_qty").over(w).cast("double")
            / F.count(F.lit(1)).over(w),
        )
        .filter(F.col("supp_qty").cast("double") > 1.5 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", F.round(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy(F.asc("s_name"))
    )


QUERIES = {
    "join_semi_customers_with_orders": join_semi_customers_with_orders,
    "agg_customer_rfm_segments": agg_customer_rfm_segments,
    "join_lateral_top_orders": join_lateral_top_orders,
    "join_q3_shipping_priority": join_q3_shipping_priority,
    "agg_rollup_revenue": agg_rollup_revenue,
    "agg_cube_order_stats": agg_cube_order_stats,
    "set_except_intersect_buyers": set_except_intersect_buyers,
    "unpivot_part_price_bands": unpivot_part_price_bands,
    "agg_grouping_sets_revenue": agg_grouping_sets_revenue,
    "join_full_outer_reconcile": join_full_outer_reconcile,
    "join_q4_order_priority": join_q4_order_priority,
    "agg_q13_customer_distribution": agg_q13_customer_distribution,
    "agg_revenue_share": agg_revenue_share,
    "window_gapfill_daily_close": window_gapfill_daily_close,
    "agg_segment_value_quantiles": agg_segment_value_quantiles,
    "quality_expectation_suite": quality_expectation_suite,
    "agg_q6_forecast_revenue": agg_q6_forecast_revenue,
    "agg_q14_promo_revenue_pct": agg_q14_promo_revenue_pct,
    "join_q15_top_supplier": join_q15_top_supplier,
    "join_q17_small_quantity_revenue": join_q17_small_quantity_revenue,
    "join_q19_disjunctive_revenue": join_q19_disjunctive_revenue,
    "join_q5_local_supplier_volume": join_q5_local_supplier_volume,
    "join_q10_returned_items": join_q10_returned_items,
    "join_q12_priority_shipping": join_q12_priority_shipping,
    "join_q7_volume_shipping": join_q7_volume_shipping,
    "join_q8_market_share": join_q8_market_share,
    "join_q18_large_volume": join_q18_large_volume,
    "join_q21_waiting_suppliers": join_q21_waiting_suppliers,
    "join_q22_idle_balance": join_q22_idle_balance,
    "join_q2_min_cost_supplier": join_q2_min_cost_supplier,
    "join_q9_product_type_profit": join_q9_product_type_profit,
    "agg_q11_important_stock": agg_q11_important_stock,
    "agg_q16_supplier_part_counts": agg_q16_supplier_part_counts,
    "join_q20_excess_shipments": join_q20_excess_shipments,
}

ORACLE_SQL = {
    "agg_customer_rfm_segments": """
        WITH anchor AS (
          SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders
        ),
        per_cust AS (
          SELECT o_custkey,
                 MAX(CAST(o_orderdate AS DATE)) AS last_order,
                 COUNT(*) AS frequency,
                 SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS monetary
          FROM orders GROUP BY o_custkey
        ),
        tagged AS (
          SELECT p.*, date_diff('day', last_order, anchor) AS recency_d
          FROM per_cust p CROSS JOIN anchor
        ),
        seg AS (
          SELECT *,
                 CASE WHEN recency_d <= 90 AND frequency >= 8 THEN 'champion'
                      WHEN recency_d <= 90 THEN 'recent'
                      WHEN frequency >= 8 THEN 'loyal_lapsing'
                      WHEN recency_d <= 365 THEN 'warm'
                      ELSE 'hibernating' END AS segment
          FROM tagged
        )
        SELECT segment, COUNT(*) AS n_customers,
               ROUND(CAST(SUM(CAST(recency_d AS DECIMAL(27,0))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_recency_d,
               ROUND(CAST(SUM(CAST(frequency AS DECIMAL(27,0))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_frequency,
               CAST(SUM(monetary) AS DOUBLE) AS total_monetary
        FROM seg GROUP BY segment
    """,
    "join_lateral_top_orders": """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 3
        ) t
    """,
    "agg_revenue_share": """
        WITH base AS (
          SELECT r_name, n_name,
                 SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS rev_dec
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name
        )
        SELECT r_name, n_name,
               ROUND(CAST(rev_dec AS DOUBLE), 2) AS revenue,
               ROUND(CAST(rev_dec AS DOUBLE)
                     / CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS region_share,
               ROUND(CAST(rev_dec AS DOUBLE)
                     / CAST(SUM(rev_dec) OVER () AS DOUBLE), 6) AS global_share
        FROM base
    """,
    "window_gapfill_daily_close": """
        WITH daily AS (
          SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
                 MAX(l_extendedprice) AS close
          FROM lineitem WHERE l_suppkey <= 5 GROUP BY 1, 2
        ),
        spine AS (
          SELECT suppkey, CAST(unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE) AS day
          FROM daily GROUP BY suppkey
        )
        SELECT s.suppkey, s.day,
               d.close IS NOT NULL AS observed,
               ROUND(LAST_VALUE(d.close IGNORE NULLS) OVER (
                 PARTITION BY s.suppkey ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_close
        FROM spine s LEFT JOIN daily d ON s.suppkey = d.suppkey AND s.day = d.day
    """,
    "join_q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
    """,
    "agg_q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    "join_full_outer_reconcile": """
        WITH early AS (
          SELECT o_custkey, COUNT(*) AS n_early,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS rev_early
          FROM orders WHERE o_orderdate < DATE '1995-06-01' GROUP BY o_custkey
        ),
        late AS (
          SELECT o_custkey, COUNT(*) AS n_late,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS rev_late
          FROM orders WHERE o_orderdate >= DATE '1995-06-01' GROUP BY o_custkey
        )
        SELECT COALESCE(e.o_custkey, l.o_custkey) AS o_custkey,
               CAST(COALESCE(e.n_early, 0) AS BIGINT) AS n_early,
               CAST(COALESCE(l.n_late, 0) AS BIGINT) AS n_late,
               ROUND(COALESCE(e.rev_early, 0.0), 2) AS rev_early,
               ROUND(COALESCE(l.rev_late, 0.0), 2) AS rev_late,
               CASE WHEN e.n_early IS NULL THEN 'new'
                    WHEN l.n_late IS NULL THEN 'churned'
                    WHEN l.rev_late > e.rev_early THEN 'grew'
                    ELSE 'shrank' END AS status
        FROM early e FULL OUTER JOIN late l ON e.o_custkey = l.o_custkey
    """,
    "agg_grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "unpivot_part_price_bands": """
        WITH wide AS (
          SELECT p_brand,
                 ROUND(MIN(p_retailprice), 2) AS min_price,
                 ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE)
                       / COUNT(*), 2) AS avg_price,
                 ROUND(MAX(p_retailprice), 2) AS max_price
          FROM part GROUP BY p_brand
        )
        SELECT p_brand, 'min_price' AS metric, min_price AS metric_value FROM wide
        UNION ALL
        SELECT p_brand, 'avg_price', avg_price FROM wide
        UNION ALL
        SELECT p_brand, 'max_price', max_price FROM wide
    """,
    "set_except_intersect_buyers": """
        WITH early AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < DATE '1995-06-01'),
             late  AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-06-01'),
             churned  AS (SELECT o_custkey, 'churned' AS cohort FROM (SELECT * FROM early EXCEPT SELECT * FROM late)),
             retained AS (SELECT o_custkey, 'retained' AS cohort FROM (SELECT * FROM early INTERSECT SELECT * FROM late))
        SELECT cohort, COUNT(*) AS n_customers
        FROM (SELECT * FROM churned UNION ALL SELECT * FROM retained)
        GROUP BY cohort
    """,
    "join_semi_customers_with_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_q3_shipping_priority": """
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "agg_rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube_order_stats": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "agg_segment_value_quantiles": """
        SELECT c_mktsegment AS segment,
               ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "quality_expectation_suite": """
        WITH checks AS (
          SELECT 'ri_lineitem_orders' AS check_name,
                 (SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
          UNION ALL
          SELECT 'ri_orders_customer',
                 (SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
          UNION ALL
          SELECT 'range_positive_price',
                 (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
          UNION ALL
          SELECT 'range_positive_qty',
                 (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
          UNION ALL
          SELECT 'range_discount_unit',
                 (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
          UNION ALL
          SELECT 'notnull_l_orderkey',
                 (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
        )
        SELECT check_name, n_violations,
               CASE WHEN n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
        FROM checks
    """,
    "agg_q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS forecast_revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "agg_q14_promo_revenue_pct": """
        SELECT promo_revenue, total_revenue,
               FLOOR(100.0 * promo_revenue / total_revenue * 1e6) / 1e6 AS promo_pct
        FROM (
          SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE) AS promo_revenue,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        )
    """,
    "join_q15_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, s_acctbal, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "join_q17_small_quantity_revenue": """
        WITH brand_li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#12'
        ),
        avg_qty AS (
          SELECT l_partkey AS agg_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS avg_qty
          FROM brand_li GROUP BY 1
        )
        SELECT FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0 * 1e6) / 1e6 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM brand_li JOIN avg_qty ON l_partkey = agg_partkey
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "join_q19_disjunctive_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "join_q5_local_supplier_volume": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
        GROUP BY n_name
    """,
    "join_q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate >= DATE '1996-10-01'
          AND o_orderdate < DATE '1997-01-01'
          AND l_returnflag = 'R'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "join_q12_priority_shipping": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    "join_q7_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(YEAR FROM l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "join_q8_market_share": """
        SELECT o_year,
               nation_volume, total_volume,
               ROUND(nation_volume / total_volume, 6) AS mkt_share
        FROM (
          SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                 CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_1'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
                   AS nation_volume,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(27,6))) AS DOUBLE) AS total_volume
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
          GROUP BY 1
        )
    """,
    "join_q18_large_volume": """
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
        FROM (
          SELECT l_orderkey AS big_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY 1
        ) big
        JOIN orders ON o_orderkey = big.big_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE sum_qty > 300
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 100
    """,
    "join_q21_waiting_suppliers": """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
    "join_q22_idle_balance": """
        WITH t AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS totacctbal
        FROM customer, t
        WHERE c_acctbal > 0
          AND c_acctbal > t.avg_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= DATE '2000-01-01'
          )
        GROUP BY 1
    """,
    "join_q2_min_cost_supplier": """
        WITH supply AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem WHERE l_quantity > 0
          GROUP BY 1, 2
        ),
        region_supply AS (
          SELECT sp.l_partkey, sp.unit_cost,
                 s.s_acctbal, s.s_name, n.n_name,
                 p.p_partkey, p.p_name
          FROM supply sp
          JOIN supplier s ON sp.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          JOIN part p ON sp.l_partkey = p.p_partkey
          WHERE r.r_name = 'EUROPE'
            AND p.p_size <= 15 AND p.p_type = 'LARGE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               ROUND(unit_cost, 6) AS supply_cost
        FROM region_supply rs
        WHERE unit_cost = (
          SELECT MIN(unit_cost) FROM region_supply rs2
          WHERE rs2.p_partkey = rs.p_partkey
        )
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        LIMIT 100
    """,
    "join_q9_product_type_profit": """
        SELECT n_name AS nation,
               EXTRACT(YEAR FROM o_orderdate) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity
                             AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
        ORDER BY nation ASC, o_year DESC
    """,
    "agg_q11_important_stock": """
        WITH routed AS (
          SELECT l_partkey,
                 CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(27,6)) AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
        )
        SELECT l_partkey AS p_partkey,
               CAST(SUM(v) AS DOUBLE) AS part_value
        FROM routed
        GROUP BY 1
        HAVING SUM(v) > (SELECT SUM(v) * 0.001 FROM routed)
        ORDER BY part_value DESC, p_partkey ASC
    """,
    "agg_q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#12'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
    "join_q20_excess_shipments": """
        WITH shipped AS (
          SELECT l_suppkey, l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(27,2))) AS supp_qty
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY 1, 2
        ),
        part_avg AS (
          SELECT l_partkey AS pa_partkey,
                 CAST(SUM(supp_qty) AS DOUBLE) / COUNT(*) AS avg_qty
          FROM shipped GROUP BY 1
        )
        SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
          AND s_suppkey IN (
            SELECT l_suppkey FROM shipped
            JOIN part_avg ON l_partkey = pa_partkey
            WHERE CAST(supp_qty AS DOUBLE) > 1.5 * avg_qty
          )
        ORDER BY s_name ASC
    """,
}


def agg_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the standard BI trend
    readout: yearly decimal-exact revenue per nation, then LAG over the
    AGGREGATE for the growth ratio. The window runs over |nations| ×
    |years| rows (the classic mistake this query demonstrates against
    is lagging the fact table); one star-join + one (nation, year)
    exchange at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    yearly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(_dsum(F.col("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("order_year")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "n_name",
        "order_year",
        F.round("revenue", 2).alias("revenue"),
        F.round(
            F.when(prev > 0, F.col("revenue") / prev - 1), 6
        ).alias("yoy_growth"),
    )


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: each order carries a validity
    interval [orderdate, orderdate + 1 + orderkey%7 days]; emit pairs
    of the SAME customer whose intervals overlap — the temporal-join
    shape behind policy/session/booking overlap checks.

    Scale: equi-join on custkey co-locates each customer's orders (per
    customer bounded), the interval predicate evaluates at the probe —
    no range shuffle, no cross join. For uncorrelated interval sets
    (no equi-key) the binned form in scale_ops is the template."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("start_d"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.lit(1) + F.col("o_orderkey") % 7).cast("int"),
        ).alias("end_d"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.start_d") <= F.col("b.end_d"))
        & (F.col("b.start_d") <= F.col("a.end_d")),
    )
    overlap = (
        F.datediff(
            F.least(F.col("a.end_d"), F.col("b.end_d")),
            F.greatest(F.col("a.start_d"), F.col("b.start_d")),
        )
        + 1
    )
    return pairs.select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("orderkey_a"),
        F.col("b.o_orderkey").alias("orderkey_b"),
        overlap.cast("long").alias("overlap_days"),
    )


def quality_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation — the audit every warehouse
    runs after a load: recompute each order's total from its line items
    (extendedprice × (1−discount) × (1+tax), decimal-exact sum) and
    report, per order status, how many orders match the recorded
    o_totalprice within a cent, plus the gap distribution. One
    orderkey shuffle collapses lineitem; the orders probe broadcasts
    nothing — it joins on the aggregate's own key."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    recomputed = li.groupBy("l_orderkey").agg(
        _dsum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            6,
        ).alias("line_total")
    )
    j = o.join(
        recomputed, o.o_orderkey == recomputed.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        "o_totalprice",
        "line_total",
        F.round(
            F.abs(F.col("o_totalprice") - F.col("line_total")), 2
        ).alias("abs_gap"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(F.col("line_total").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_no_lineitems"),
        F.sum(F.when(F.col("abs_gap") <= 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
        F.round(_dsum(F.coalesce(F.col("abs_gap"), F.lit(0.0)), 2), 2).alias(
            "total_abs_gap"
        ),
    )


QUERIES.update(
    {
        "agg_yoy_revenue_growth": agg_yoy_revenue_growth,
        "join_interval_overlap": join_interval_overlap,
        "quality_order_total_reconciliation": quality_order_total_reconciliation,
    }
)

ORACLE_SQL.update(
    {
        "agg_yoy_revenue_growth": """
            WITH yearly AS (
              SELECT n_name,
                     CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1, 2
            )
            SELECT n_name, order_year,
                   ROUND(revenue, 2) AS revenue,
                   ROUND(CASE WHEN LAG(revenue) OVER w > 0
                              THEN revenue / LAG(revenue) OVER w - 1
                         END, 6) AS yoy_growth
            FROM yearly
            WINDOW w AS (PARTITION BY n_name ORDER BY order_year)
        """,
        "join_interval_overlap": """
            WITH o AS (
              SELECT o_orderkey, o_custkey,
                     CAST(o_orderdate AS DATE) AS start_d,
                     CAST(o_orderdate AS DATE)
                       + TO_DAYS(CAST(1 + o_orderkey % 7 AS INT)) AS end_d
              FROM orders
            )
            SELECT a.o_custkey AS custkey,
                   a.o_orderkey AS orderkey_a,
                   b.o_orderkey AS orderkey_b,
                   CAST(date_diff('day',
                                  GREATEST(a.start_d, b.start_d),
                                  LEAST(a.end_d, b.end_d)) + 1
                        AS BIGINT) AS overlap_days
            FROM o a JOIN o b
              ON a.o_custkey = b.o_custkey
             AND a.o_orderkey < b.o_orderkey
             AND a.start_d <= b.end_d
             AND b.start_d <= a.end_d
        """,
        "quality_order_total_reconciliation": """
            WITH recomputed AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                   AS DECIMAL(27,6))) AS DOUBLE) AS line_total
              FROM lineitem GROUP BY l_orderkey
            ),
            j AS (
              SELECT o_orderstatus, o_totalprice, line_total,
                     ROUND(ABS(o_totalprice - line_total), 2) AS abs_gap
              FROM orders LEFT JOIN recomputed ON o_orderkey = l_orderkey
            )
            SELECT o_orderstatus,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_no_lineitems,
                   CAST(SUM(CASE WHEN abs_gap <= 0.01 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_reconciled,
                   ROUND(CAST(SUM(CAST(COALESCE(abs_gap, 0.0) AS DECIMAL(27,2)))
                              AS DOUBLE), 2) AS total_abs_gap
            FROM j GROUP BY o_orderstatus
        """,
    }
)


def window_linear_interpolate_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine densification + LINEAR interpolation: the repair-side
    companion to ``window_gapfill_daily_close`` for series where a
    carried-forward step function misstates the gap (prices drift, they
    don't freeze). Each missing day gets
    ``prev + (next − prev) · Δ/Δtotal`` between its bracketing
    observations; days before the first / after the last observation
    fall back to the nearest one.

    Plan: the spine explode is identical to the gapfill query; the
    bracket lookup is two window passes over the SAME suppkey exchange
    (prev via last(IGNORE NULLS) unbounded-preceding, next via
    first(IGNORE NULLS) unbounded-following — Catalyst runs both in
    one WindowExec pair on one sort), so interpolation costs exactly
    one more window pass than forward-fill, still zero joins beyond
    the spine. The arithmetic is one per-row IEEE expression written
    identically in the oracle — bit-equal without any decimal detour
    because nothing crosses rows after the (deterministic) windows."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    daily = li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(F.max("l_extendedprice").alias("close"))
    spine = (
        daily.groupBy("suppkey")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "suppkey",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    wb = (
        Window.partitionBy("suppkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("suppkey")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("close").isNotNull(), F.col("day"))
    j = (
        spine.join(daily, ["suppkey", "day"], "left")
        .withColumn("prev_close", F.last("close", ignorenulls=True).over(wb))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("next_close", F.first("close", ignorenulls=True).over(wf))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(wf))
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    ).cast("double")
    interp = (
        F.when(F.col("prev_close").isNull(), F.col("next_close"))
        .when(F.col("next_close").isNull(), F.col("prev_close"))
        .when(F.col("next_day") == F.col("prev_day"), F.col("prev_close"))
        .otherwise(
            F.col("prev_close")
            + (F.col("next_close") - F.col("prev_close")) * frac
        )
    )
    return j.select(
        "suppkey",
        "day",
        F.col("close").isNotNull().alias("observed"),
        F.round(interp, 6).alias("interp_close"),
    )


QUERIES.update(
    {"window_linear_interpolate_close": window_linear_interpolate_close}
)

ORACLE_SQL.update(
    {
        "window_linear_interpolate_close": """
        WITH daily AS (
          SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
                 MAX(l_extendedprice) AS close
          FROM lineitem WHERE l_suppkey <= 5 GROUP BY 1, 2
        ),
        spine AS (
          SELECT suppkey, CAST(unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE) AS day
          FROM daily GROUP BY suppkey
        ),
        f AS (
          SELECT s.suppkey, s.day, d.close,
                 LAST_VALUE(d.close IGNORE NULLS) OVER (
                   PARTITION BY s.suppkey ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_close,
                 LAST_VALUE(CASE WHEN d.close IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
                   PARTITION BY s.suppkey ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
                 FIRST_VALUE(d.close IGNORE NULLS) OVER (
                   PARTITION BY s.suppkey ORDER BY s.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_close,
                 FIRST_VALUE(CASE WHEN d.close IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
                   PARTITION BY s.suppkey ORDER BY s.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
          FROM spine s LEFT JOIN daily d ON s.suppkey = d.suppkey AND s.day = d.day
        )
        SELECT suppkey, day,
               close IS NOT NULL AS observed,
               ROUND(CASE
                 WHEN prev_close IS NULL THEN next_close
                 WHEN next_close IS NULL THEN prev_close
                 WHEN next_day = prev_day THEN prev_close
                 ELSE prev_close + (next_close - prev_close)
                      * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                         / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
               END, 6) AS interp_close
        FROM f
    """,
    }
)
