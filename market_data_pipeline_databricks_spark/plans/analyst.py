"""Analyst query corpus (reference sql/example_queries.sql:1-172).

Each of the reference's canonical ad-hoc query shapes over the gold
feature table, re-expressed over the testdata gold base
(:func:`relational._supplier_daily_gold` — (suppkey, day) plays
(symbol, date)):

- latest-snapshot per key via QUALIFY → ROW_NUMBER rewrite (:7-15)
  [already covered: window_latest_snapshot_per_supplier]
- top movers today (scalar-subquery max date + ABS sort, :17-25)
- volatility regime scan (:27-34)
- liquidity screen (:36-43)
- single-symbol recent window (:45-54)
- threshold alert scan (:123-132)
- volatility expansion as a RANGE-frame window (:135-149 — the
  scale-path formulation of join_range_volatility_expansion)
- point-in-time cross-section on a DATE literal (:152-161)
- completeness check (:164-171)
- latest-run DQ triage with a CTE (docs/use_cases.md:48-57)

Scale notes: every query here consumes the gold base, which reduces
the fact table to O(keys × days) rows behind one suppkey shuffle; the
latest-day scalar subqueries are 1-row broadcasts; the RANGE window
replaces the O(days×60) self-join with a single sorted pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.plans.relational import (
    _GOLD_CTE,
    _dsum,
    _events,
    _supplier_daily_gold,
    _t,
)


def _latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = _supplier_daily_gold(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy(F.desc("day"))
    return gold.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)


def analyst_top_movers_today(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top movers on the latest day: scalar-subquery max date + ABS
    sort + LIMIT (reference sql/example_queries.sql:17-25)."""
    gold = _supplier_daily_gold(spark, sf_dir)
    mx = gold.agg(F.max("day").alias("max_day"))
    return (
        gold.join(F.broadcast(mx), gold.day == mx.max_day)
        .filter(F.col("return_1d").isNotNull())
        .select(
            "suppkey",
            "day",
            F.round(F.col("return_1d"), 6).alias("return_1d"),
            F.round(F.abs("return_1d"), 6).alias("abs_return"),
        )
        .orderBy(F.desc("abs_return"), F.asc("suppkey"))
        .limit(10)
    )


def analyst_volatility_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-volatility regime scan on the latest snapshot (reference
    sql/example_queries.sql:27-34)."""
    return (
        _latest_snapshot(spark, sf_dir)
        .filter(F.col("vol_20d") > 0.5)
        .select("suppkey", "day", "vol_20d")
    )


def analyst_liquidity_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin-liquidity screen on the latest snapshot (reference
    sql/example_queries.sql:36-43)."""
    return (
        _latest_snapshot(spark, sf_dir)
        .filter(F.col("avg_volume_20d") < 50.0)
        .select("suppkey", "day", "avg_volume_20d")
    )


def analyst_single_key_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-instrument recent history: partition-pruned key filter +
    last-60-rows window (reference sql/example_queries.sql:45-54).

    Scale: with the gold table partitioned by key this is a
    single-partition read; day is unique within a key so the LIMIT is
    deterministic."""
    gold = _supplier_daily_gold(spark, sf_dir)
    return (
        gold.filter(F.col("suppkey") == 1)
        .select("suppkey", "day", "close", "return_1d", "vol_20d")
        .orderBy(F.desc("day"))
        .limit(60)
    )


def analyst_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-history alert scan: |return| above alert threshold with
    context columns (reference sql/example_queries.sql:123-132)."""
    gold = _supplier_daily_gold(spark, sf_dir)
    return (
        gold.filter(F.col("return_1d").isNotNull() & (F.abs("return_1d") > 1.0))
        .select(
            "suppkey",
            "day",
            F.round(F.col("return_1d"), 6).alias("return_1d"),
            "vol_20d",
        )
    )


def window_rolling_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1's volatility expansion as a RANGE-frame window instead of a
    self range-join (reference sql/example_queries.sql:135-149).

    Scale path: one sorted pass over the daily series (RANGE BETWEEN
    59 PRECEDING AND CURRENT ROW on integer day number) replaces the
    O(days × 60) join — same rows as join_range_volatility_expansion.
    """
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        _dsum(F.col("o_totalprice"), 2).alias("revenue")
    )
    daily = daily.withColumn(
        "day_num", F.datediff("day", F.lit("1992-01-01").cast("date"))
    )
    # single-partition window: bounded — input is one row per day
    # (aggregate-collapsed), so cardinality ~ trading days, not facts
    w = Window.orderBy("day_num").rangeBetween(-59, 0)
    return (
        daily.withColumn(
            "avg_rev_60d",
            F.round(
                F.sum(F.col("revenue").cast("decimal(27,2)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w),
                6,
            ),
        )
        .filter(F.col("revenue") > 1.5 * F.col("avg_rev_60d"))
        .select("day", "revenue", "avg_rev_60d")
    )


def analyst_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time cross-section on a DATE literal (reference
    sql/example_queries.sql:152-161)."""
    gold = _supplier_daily_gold(spark, sf_dir)
    return (
        gold.filter(F.col("day") == F.lit("1996-06-14").cast("date"))
        .select("suppkey", "day", "close", "return_1d", "vol_20d", "avg_volume_20d")
    )


def analyst_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage/completeness report: per-key latest day and lag behind
    the global max (reference sql/example_queries.sql:164-171; the
    report-all sibling of window_stale_check)."""
    li = _t(spark, sf_dir, "lineitem")
    latest = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.max(F.col("l_shipdate").cast("date")).alias("latest_day"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    today = li.agg(F.max(F.col("l_shipdate").cast("date")).alias("global_max"))
    return (
        latest.crossJoin(F.broadcast(today))
        .select(
            "suppkey",
            "latest_day",
            "n_rows",
            F.datediff("global_max", F.col("latest_day")).cast("long").alias(
                "days_behind"
            ),
        )
    )


def analyst_dq_triage_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-run triage via CTE (reference docs/use_cases.md:48-57):
    restrict to the latest event day, summarize by type."""
    ev = _events(spark, sf_dir)
    ev = ev.withColumn("day", F.col("ts").cast("date"))
    latest = ev.agg(F.max("day").alias("latest_day"))
    return (
        ev.join(F.broadcast(latest), ev.day == latest.latest_day)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )



def quality_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive DQ check (beyond the reference's fixed thresholds,
    04_data_quality_checks.py:15-17): flag days whose return is > 3
    sample-stddevs from that key's own mean — per-instrument adaptive
    thresholds from one extra aggregation. Decimal mean AND decimal
    Σx²-derived stddev (a raw groupBy STDDEV_SAMP merges buffers in
    task order — low bits vary run to run); the z-ratio is
    floor-truncated (half-way-safe)."""
    gold = _supplier_daily_gold(spark, sf_dir)
    r = gold.filter(F.col("return_1d").isNotNull())
    n = F.count(F.lit(1))
    s12 = F.sum(F.col("return_1d").cast("decimal(27,12)")).cast("double")
    ss = F.sum(
        (F.col("return_1d") * F.col("return_1d")).cast("decimal(27,12)")
    ).cast("double")
    stats = r.groupBy("suppkey").agg(
        (
            F.sum(F.col("return_1d").cast("decimal(27,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        F.when(
            n > 1,
            F.sqrt(F.greatest((ss - s12 * s12 / n) / (n - 1), F.lit(0.0))),
        ).alias("sd"),
        F.count(F.lit(1)).alias("n_days"),
    )
    z = (F.col("return_1d") - F.col("mu")) / F.col("sd")
    return (
        r.join(F.broadcast(stats), "suppkey")
        .filter(F.col("sd") > 0)
        .withColumn("z", F.floor(z * 1e6) / 1e6)
        .filter(F.abs("z") > 3.0)
        .select("suppkey", "day", F.round("return_1d", 6).alias("return_1d"), "z")
    )


def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust DQ twin of quality_zscore_outliers: flag days whose
    return deviates from the key's MEDIAN by > 5× the median absolute
    deviation. Unlike the z-score, one genuine fat-tail event cannot
    inflate the threshold and mask a second one (mean/stddev are not
    robust; median/MAD are).

    Plan: the median and the MAD are stacked per-key WINDOW aggregates
    (unbounded frame over the suppkey partition) — ONE scan of the
    gold base and ONE exchange on suppkey serve both percentile passes
    (the second WindowExec reuses the first's partitioning), instead
    of the grouped-percentile + join-back formulation whose two
    derived frames re-execute the gold lineage. Per-partition state is
    O(days per key), bounded. Medians round to 6 dp before the
    comparison and the ratio is floor-truncated, so both engines
    compare identical bits."""
    from pyspark.sql import Window

    gold = _supplier_daily_gold(spark, sf_dir)
    w = Window.partitionBy("suppkey")
    dev = (
        gold.filter(F.col("return_1d").isNotNull())
        .select("suppkey", "day", "return_1d")
        .withColumn(
            "med", F.round(F.expr("percentile(return_1d, 0.5)").over(w), 6)
        )
        .withColumn("adev", F.abs(F.col("return_1d") - F.col("med")))
        .withColumn("mad", F.round(F.expr("percentile(adev, 0.5)").over(w), 6))
    )
    ratio = F.floor(F.col("adev") / F.col("mad") * 1e6) / 1e6
    return (
        dev.filter(F.col("mad") > 0)
        .withColumn("mad_ratio", ratio)
        .filter(F.col("mad_ratio") > 5.0)
        .select(
            "suppkey",
            "day",
            F.round("return_1d", 6).alias("return_1d"),
            "mad_ratio",
        )
    )


def quality_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    classic fabricated-numbers DQ check: observed share per leading
    digit vs the log₁₀(1+1/d) expectation, plus the corpus-level χ²
    statistic repeated on each row (bounded 9-row window).

    First digit = ⌊x / 10^⌊log₁₀x⌋⌋ — log₁₀ of a positive
    cent-quantized price can only straddle an integer at exact powers
    of 10, where every libm returns the exact value, so the digit
    extraction cannot diverge between engines. Counts are exact
    integers; every derived double (share, expectation, χ²) comes from
    identical bits. One scan + one 9-key aggregate."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    g = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    # single-partition window: bounded — 9 Benford digit rows
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total = F.sum("n_orders").over(wall).cast("double")
    expected = F.log10(1 + 1 / F.col("digit").cast("double"))
    chi_term = (
        (F.col("n_orders") / total - expected)
        * (F.col("n_orders") / total - expected)
        / expected
        * total
    )
    return g.select(
        "digit",
        "n_orders",
        F.round(F.col("n_orders") / total, 6).alias("obs_share"),
        F.round(expected, 6).alias("benford_share"),
        F.round(F.sum(chi_term).over(wall), 6).alias("chi2_stat"),
    )


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the token distribution: OLS slope
    of ln(freq) on ln(rank) across the top-200 tokens — the corpus
    health number (natural language sits near −1; a synthetic or
    templated corpus drifts off it). Single row out.

    Rank is deterministic (count desc, token asc tie-break); both lns
    act on exact integers, and the OLS slope/intercept derive from
    decimal-exact component sums (the funcs_market_beta discipline),
    so the fit is bit-stable on both engines. Top-k is a
    TakeOrderedAndProject, not a global sort."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.operators import text as TX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(200)
    )
    ranked = top.withColumn(
        "rank",
        # single-partition window: bounded — input is the limit(200)
        # token frame above, never the corpus
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token"))),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )

    def dsum(col):
        return F.sum(col.cast("decimal(27,12)")).cast("double")

    comp = ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return comp.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen over quasi-identifiers: for QI =
    (c_mktsegment, c_nationkey), report every equivalence class of
    size < k (k=10) — the re-identification risk audit that pairs with
    the PII redaction (operators/text.py:redact_pii) and the erasure
    sink (sources/writers.py:erase_keys): redaction strips direct
    identifiers, this catches the INDIRECT ones (classes small enough
    to single a person out). Adds the corpus-level k_min every privacy
    review asks for first.

    Scale: one map-side-combinable aggregate on the QI tuple
    (O(classes) output), plus a 1-row bounded window for k_min."""
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer")
    classes = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    # single-partition window: bounded — mktsegment x nationkey classes (~125 rows)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        classes.withColumn("k_min", F.min("class_size").over(wall))
        .filter(F.col("class_size") < 10)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "class_size",
            "k_min",
        )
    )


QUERIES = {
    "quality_k_anonymity": quality_k_anonymity,
    "quality_benford_screen": quality_benford_screen,
    "text_zipf_fit": text_zipf_fit,
    "analyst_top_movers_today": analyst_top_movers_today,
    "analyst_volatility_regime": analyst_volatility_regime,
    "analyst_liquidity_screen": analyst_liquidity_screen,
    "analyst_single_key_recent": analyst_single_key_recent,
    "analyst_threshold_alerts": analyst_threshold_alerts,
    "window_rolling_range_avg": window_rolling_range_avg,
    "analyst_point_in_time": analyst_point_in_time,
    "analyst_completeness": analyst_completeness,
    "analyst_dq_triage_cte": analyst_dq_triage_cte,
    "quality_zscore_outliers": quality_zscore_outliers,
    "quality_mad_outliers": quality_mad_outliers,
}

_SNAPSHOT_CTE = _GOLD_CTE + """, snap AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY suppkey ORDER BY day DESC) AS rn
    FROM feat
  ) WHERE rn = 1
)
"""

ORACLE_SQL = {
    "quality_k_anonymity": """
        WITH classes AS (
          SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                 COUNT(*) AS class_size
          FROM customer GROUP BY 1, 2
        )
        SELECT c_mktsegment, c_nationkey, class_size,
               (SELECT MIN(class_size) FROM classes) AS k_min
        FROM classes
        WHERE class_size < 10
    """,
    "quality_benford_screen": """
        WITH g AS (
          SELECT CAST(FLOOR(o_totalprice
                   / POWER(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY 1
        ),
        t AS (SELECT SUM(n_orders) AS tot FROM g),
        s AS (
          SELECT digit, n_orders,
                 CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
                 LOG10(1 + 1 / CAST(digit AS DOUBLE)) AS expected,
                 CAST(tot AS DOUBLE) AS tot
          FROM g CROSS JOIN t
        )
        SELECT digit, n_orders,
               ROUND(share, 6) AS obs_share,
               ROUND(expected, 6) AS benford_share,
               ROUND(SUM((share - expected) * (share - expected) / expected * tot)
                     OVER (), 6) AS chi2_stat
        FROM s
    """,
    "text_zipf_fit": r"""
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[.,!?;:''"()\[\]{}\-]', '', 'g'), '\s+', ' ', 'g')) AS ntext
          FROM documents
        ),
        tokc AS (
          SELECT tokn, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(ntext, ' ')) AS tokn FROM norm
          ) GROUP BY tokn
        ),
        top AS (
          SELECT tokn, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, tokn ASC) AS rank
          FROM tokc
          ORDER BY cnt DESC, tokn ASC LIMIT 200
        ),
        xy AS (
          SELECT LN(CAST(rank AS DOUBLE)) AS x, LN(CAST(cnt AS DOUBLE)) AS y
          FROM top
        ),
        comp AS (
          SELECT COUNT(*) AS n_terms,
                 CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(27,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(x * y AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) AS sxx
          FROM xy
        )
        SELECT n_terms,
               ROUND((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n_terms AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
               ROUND((sy - (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                          / (CAST(n_terms AS DOUBLE) * sxx - sx * sx) * sx)
                     / CAST(n_terms AS DOUBLE), 6) AS zipf_intercept
        FROM comp
    """,
    "quality_mad_outliers": _GOLD_CTE + """,
        r AS (SELECT suppkey, day, return_1d FROM feat WHERE return_1d IS NOT NULL),
        med AS (
          SELECT suppkey, ROUND(quantile_cont(return_1d, 0.5), 6) AS med
          FROM r GROUP BY suppkey
        ),
        dev AS (
          SELECT r.suppkey AS suppkey, r.day AS day, r.return_1d AS return_1d,
                 ABS(r.return_1d - m.med) AS adev
          FROM r JOIN med m ON r.suppkey = m.suppkey
        ),
        mad AS (
          SELECT suppkey, ROUND(quantile_cont(adev, 0.5), 6) AS mad
          FROM dev GROUP BY suppkey
        )
        SELECT d.suppkey AS suppkey, d.day AS day,
               ROUND(d.return_1d, 6) AS return_1d,
               FLOOR(d.adev / m.mad * 1e6) / 1e6 AS mad_ratio
        FROM dev d JOIN mad m ON d.suppkey = m.suppkey
        WHERE m.mad > 0 AND FLOOR(d.adev / m.mad * 1e6) / 1e6 > 5.0
    """,
    "quality_zscore_outliers": _GOLD_CTE + """,
        r AS (SELECT suppkey, day, return_1d FROM feat WHERE return_1d IS NOT NULL),
        stats AS (
          SELECT suppkey,
                 CAST(SUM(CAST(return_1d AS DECIMAL(27,9))) AS DOUBLE) / COUNT(*) AS mu,
                 CASE WHEN COUNT(*) > 1 THEN SQRT(GREATEST(
                   (CAST(SUM(CAST(return_1d * return_1d AS DECIMAL(27,12)))
                         AS DOUBLE)
                    - CAST(SUM(CAST(return_1d AS DECIMAL(27,12))) AS DOUBLE)
                      * CAST(SUM(CAST(return_1d AS DECIMAL(27,12))) AS DOUBLE)
                      / COUNT(*))
                   / (COUNT(*) - 1), 0.0)) END AS sd
          FROM r GROUP BY suppkey
        )
        SELECT r.suppkey AS suppkey, r.day AS day,
               ROUND(r.return_1d, 6) AS return_1d,
               FLOOR((r.return_1d - mu) / sd * 1e6) / 1e6 AS z
        FROM r JOIN stats ON r.suppkey = stats.suppkey
        WHERE sd > 0 AND ABS(FLOOR((r.return_1d - mu) / sd * 1e6) / 1e6) > 3.0
    """,
    "analyst_top_movers_today": _GOLD_CTE + """
        SELECT suppkey, day, ROUND(return_1d, 6) AS return_1d,
               ROUND(ABS(return_1d), 6) AS abs_return
        FROM feat
        WHERE day = (SELECT MAX(day) FROM feat) AND return_1d IS NOT NULL
        ORDER BY abs_return DESC, suppkey ASC LIMIT 10
    """,
    "analyst_volatility_regime": _SNAPSHOT_CTE + """
        SELECT suppkey, day, vol_20d FROM snap WHERE vol_20d > 0.5
    """,
    "analyst_liquidity_screen": _SNAPSHOT_CTE + """
        SELECT suppkey, day, avg_volume_20d FROM snap WHERE avg_volume_20d < 50.0
    """,
    "analyst_single_key_recent": _GOLD_CTE + """
        SELECT suppkey, day, close, return_1d, vol_20d
        FROM feat WHERE suppkey = 1 ORDER BY day DESC LIMIT 60
    """,
    "analyst_threshold_alerts": _GOLD_CTE + """
        SELECT suppkey, day, ROUND(return_1d, 6) AS return_1d, vol_20d
        FROM feat WHERE return_1d IS NOT NULL AND ABS(return_1d) > 1.0
    """,
    "window_rolling_range_avg": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1
        ), numbered AS (
          SELECT day, revenue,
                 date_diff('day', DATE '1992-01-01', day) AS day_num
          FROM daily
        )
        SELECT day, revenue, avg_rev_60d FROM (
          SELECT day, revenue,
                 ROUND(CAST(SUM(CAST(revenue AS DECIMAL(27,2))) OVER w AS DOUBLE)
                       / COUNT(*) OVER w, 6) AS avg_rev_60d
          FROM numbered
          WINDOW w AS (ORDER BY day_num RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)
        ) WHERE revenue > 1.5 * avg_rev_60d
    """,
    "analyst_point_in_time": _GOLD_CTE + """
        SELECT suppkey, day, close, return_1d, vol_20d, avg_volume_20d
        FROM feat WHERE day = DATE '1996-06-14'
    """,
    "analyst_completeness": """
        SELECT l_suppkey AS suppkey, MAX(CAST(l_shipdate AS DATE)) AS latest_day,
               COUNT(*) AS n_rows,
               CAST(date_diff('day', MAX(CAST(l_shipdate AS DATE)),
                    (SELECT MAX(CAST(l_shipdate AS DATE)) FROM lineitem)) AS BIGINT) AS days_behind
        FROM lineitem GROUP BY l_suppkey
    """,
    "analyst_dq_triage_cte": """
        WITH latest AS (SELECT MAX(CAST(ts AS DATE)) AS latest_day FROM events)
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events, latest
        WHERE CAST(ts AS DATE) = latest_day
        GROUP BY event_type
    """,
}


def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift screen — the standard "did this
    column's distribution move between batches" monitor (credit-risk
    lineage, now the go-to for feature/label drift): o_totalprice is
    decile-bucketed over its GLOBAL range in exact integer arithmetic
    (cents, fixed-width buckets, top-bucket clamp), split into
    reference (< 1996) vs current (>= 1996) cohorts, and each bucket
    reports its add-one-smoothed PSI contribution
    (q − p)·ln(q/p). Σ contributions < 0.1 is the conventional
    "stable" line. Deterministic end to end: integer bucketing, exact
    count ratios, one ln per bucket — the DuckDB oracle replays every
    contribution.

    Scale shape: one projection + one 10-key groupBy; the range bounds
    and cohort totals are 1-row broadcasts."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")).alias(
            "is_cur"
        ),
    )
    b = orders.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    bucketed = orders.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(9), F.expr("((cents - mn) * 10) div (mx - mn + 1)")
        ).cast("long").alias("bucket"),
        "is_cur",
    )
    cnt = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_cur"), 0).otherwise(1)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0)).cast("long").alias("n_cur"),
    )
    tot = cnt.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    p = (F.col("n_ref") + F.lit(1)).cast("double") / (F.col("tr") + F.lit(10))
    q = (F.col("n_cur") + F.lit(1)).cast("double") / (F.col("tc") + F.lit(10))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((q - p) * F.log(q / p), 6).alias("psi_contrib"),
    )


QUERIES.update({"quality_psi_drift": quality_psi_drift})

ORACLE_SQL.update(
    {
        "quality_psi_drift": """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         (o_orderdate >= DATE '1996-01-01') AS is_cur
  FROM orders
),
b AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM o),
bk AS (
  SELECT LEAST(9, ((cents - mn) * 10) // (mx - mn + 1)) AS bucket, is_cur
  FROM o, b
),
cnt AS (
  SELECT CAST(bucket AS BIGINT) AS bucket,
         CAST(SUM(CASE WHEN is_cur THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM bk GROUP BY 1
),
tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM cnt)
SELECT bucket, n_ref, n_cur,
       ROUND((CAST(n_cur + 1 AS DOUBLE) / (tc + 10)
              - CAST(n_ref + 1 AS DOUBLE) / (tr + 10))
             * ln((CAST(n_cur + 1 AS DOUBLE) / (tc + 10))
                  / (CAST(n_ref + 1 AS DOUBLE) / (tr + 10))), 6)
         AS psi_contrib
FROM cnt, tot
"""
    }
)


def quality_pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pseudonymization + k-anonymity generalization — the
    compliance transform a training-data pipeline applies before
    customer-derived records may enter a corpus:

    - ``pseudo_id``: salted SHA-256 of the direct identifier
      (deterministic — the same person joins across tables — but
      irreversible without the pepper; rotate the pepper to unlink);
    - ``name_masked``: structural redaction keeping only the
      non-identifying prefix;
    - ``bal_bucket``: the quasi-identifier generalized to $1000 bands
      (k-anonymity style: coarse enough that bands are populated);
    - ``k_ok``: per (segment, band) group size ≥ 5 — the k-anonymity
      audit bit a release gate would enforce.

    Both engines compute the identical SHA-256 (lowercase hex on
    both), and bucketing divides the SAME ieee double by 1000.0 before
    FLOOR, so the quasi-identifier generalization is bit-replayable.

    Scale shape: pure per-row projections + one window count over the
    (segment, band) grid — no UDFs, no shuffle beyond the count; runs
    where the data lives, which is the point for data that must not
    be collected to a driver."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment", "bal_bucket")
    return (
        c.select(
            F.sha2(
                F.concat(F.lit("pepper-2026:"), F.col("c_name")), 256
            ).alias("pseudo_id"),
            F.concat(F.substring("c_name", 1, 9), F.lit("#########")).alias(
                "name_masked"
            ),
            F.col("c_nationkey").cast("int").alias("nation_key"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0))
            .cast("long")
            .alias("bal_bucket"),
            "c_mktsegment",
        )
        .withColumn(
            "k_ok", (F.count(F.lit(1)).over(w) >= F.lit(5)).cast("boolean")
        )
    )


QUERIES.update({"quality_pii_pseudonymize": quality_pii_pseudonymize})

ORACLE_SQL.update(
    {
        "quality_pii_pseudonymize": """
WITH p AS (
  SELECT sha256('pepper-2026:' || c_name) AS pseudo_id,
         substr(c_name, 1, 9) || '#########' AS name_masked,
         CAST(c_nationkey AS INT) AS nation_key,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment
  FROM customer
)
SELECT *,
       COUNT(*) OVER (PARTITION BY c_mktsegment, bal_bucket) >= 5 AS k_ok
FROM p
"""
    }
)


def quality_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-constraint validation — the dbt-test / Delta-constraint
    surface as a single query: every table contract the warehouse
    relies on, each evaluated to a (constraint, n_checked,
    n_violations) row:

    - ``orders_pk_unique``: o_orderkey is a primary key (violations =
      excess rows beyond the distinct key count);
    - ``orders_custkey_not_null``: required column;
    - ``orders_fk_customer``: referential integrity orders→customer
      (anti-join count; AQE picks broadcast vs shuffle by the key
      side's actual size — no forced hint, so the check degrades to a
      shuffle anti-join instead of a broadcast OOM when the dimension
      outgrows the limit);
    - ``lineitem_fk_orders``: referential integrity lineitem→orders;
    - ``orders_status_domain``: accepted-values set {O, F, P};
    - ``lineitem_qty_positive``: range check.

    Plan shape: ALL of a table's row-level checks fold into ONE
    aggregate scan (count, not-null, domain, and pk-excess via
    count-distinct together), the two FK checks are anti-join counts,
    and the five 1-row aggregates cross-assemble into a single row
    that explodes to the six output rows — each source subtree is
    evaluated exactly once (orders appears in 3 subtrees: its combined
    aggregate plus one side of each FK anti-join; lineitem in 2),
    nothing materializes violating rows, and the audit output is
    constant-size no matter the table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    zero = F.lit(0).cast("long")
    o_base = o.agg(
        F.count(F.lit(1)).cast("long").alias("o_n"),
        F.coalesce(
            F.sum(F.col("o_custkey").isNull().cast("long")), zero
        ).alias("o_v_nn"),
        F.coalesce(
            F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")),
            zero,
        ).alias("o_v_dom"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("o_v_pk"),
    )
    fk_o = (
        o.select("o_custkey")
        .join(
            c.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o_v_fk"))
    )
    li_base = li.agg(
        F.count(F.lit(1)).cast("long").alias("li_n"),
        F.coalesce(
            F.sum((~(F.col("l_quantity") > 0)).cast("long")), zero
        ).alias("li_v_qty"),
    )
    fk_li = (
        li.select("l_orderkey")
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("li_v_fk"))
    )

    def entry(name, checked, violations):
        return F.struct(
            F.lit(name).alias("constraint"),
            F.col(checked).alias("n_checked"),
            F.col(violations).alias("n_violations"),
        )

    assembled = (
        o_base.crossJoin(fk_o).crossJoin(li_base).crossJoin(fk_li)
    )
    return assembled.select(
        F.explode(
            F.array(
                entry("orders_pk_unique", "o_n", "o_v_pk"),
                entry("orders_custkey_not_null", "o_n", "o_v_nn"),
                entry("orders_fk_customer", "o_n", "o_v_fk"),
                entry("lineitem_fk_orders", "li_n", "li_v_fk"),
                entry("orders_status_domain", "o_n", "o_v_dom"),
                entry("lineitem_qty_positive", "li_n", "li_v_qty"),
            )
        ).alias("e")
    ).select("e.*")


QUERIES.update({"quality_constraint_suite": quality_constraint_suite})

ORACLE_SQL.update(
    {
        "quality_constraint_suite": """
SELECT 'orders_pk_unique' AS constraint,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_checked,
       CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_custkey_not_null',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'orders_fk_customer',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem_fk_orders',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'orders_status_domain',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
UNION ALL
SELECT 'lineitem_qty_positive',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem
             WHERE NOT (l_quantity > 0)) AS BIGINT)
"""
    }
)


def quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the forensic DQ
    check a finance pipeline runs on any value column humans could
    have fabricated (fabricated figures under-use leading 1s and 2s;
    naturally multiplicative amounts follow log10(1+1/d)). Emits one
    row per leading digit: observed count, observed share, the Benford
    expectation, and a >1%-absolute-deviation flag.

    Determinism: the digit comes from the decimal's STRING form (both
    engines print DECIMAL(12,2) without leading zeros or exponent), so
    no log10-at-a-power-boundary float hazard; counts are exact ints,
    the total rides a window SUM over the 9 digit rows (exact), and
    all per-row float math (share, deviation) runs on identical bits.
    Scale: one scan, one 9-group aggregate, a 9-row window — free."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    per_digit = (
        o.select(
            F.substring(
                F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
                1,
                1,
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    # single-partition window: bounded — the input is the per-digit
    # aggregate, at most 9 rows (leading digits 1..9)
    total = F.sum("n_orders").over(Window.partitionBy())
    share = F.col("n_orders").cast("double") / total.cast("double")
    benford_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return per_digit.select(
        "digit",
        "n_orders",
        F.round(share, 6).alias("obs_share"),
        F.round(benford_p, 6).alias("benford_p"),
        (F.abs(share - benford_p) > 0.01).alias("deviates"),
    )


QUERIES.update({"quality_benford_audit": quality_benford_audit})

ORACLE_SQL.update(
    {
        "quality_benford_audit": """
WITH per_digit AS (
  SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT digit, n_orders,
       ROUND(CAST(n_orders AS DOUBLE)
             / CAST(SUM(n_orders) OVER () AS DOUBLE), 6) AS obs_share,
       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
       abs(CAST(n_orders AS DOUBLE) / CAST(SUM(n_orders) OVER () AS DOUBLE)
           - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) > 0.01 AS deviates
FROM per_digit
"""
    }
)
