"""Feature-function queries: the functions/ library driven end-to-end
over the testdata gold base, oracle-checked against DuckDB.

One shuffle on suppkey serves all features (shared Window); everything
else is sort-local arithmetic — the plan a 100 TB feature build wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.functions import market as M
from market_data_pipeline_databricks_spark.plans.relational import _t


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(
        F.max("l_extendedprice").alias("close"),
        F.sum("l_quantity").alias("volume"),
    )


def funcs_feature_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP / drawdown / z-score / momentum panel per (suppkey, day)."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    close, vol = F.col("close"), F.col("volume")
    return daily.select(
        "suppkey",
        "day",
        "close",
        # floor-truncate, not ROUND: the quotient can land exactly on a
        # half-way point where Spark (HALF_UP on decimal repr) and
        # DuckDB (double arithmetic) disagree; floor of x*1e6 is pure
        # IEEE and bit-identical everywhere.
        (F.floor(M.rolling_vwap(close, vol, w, 20) * 1e6) / 1e6).alias("vwap_20d"),
        F.round(M.drawdown(close, w), 6).alias("drawdown"),
        F.round(M.zscore(close, w, 20), 6).alias("zscore_20d"),
        F.round(M.momentum(close, w, 5), 6).alias("momentum_5d"),
    )


def funcs_log_return_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key log-return summary: annualization-ready mean/stddev.
    Mean AND stddev derive from decimal-exact sums (Σx, Σx²) — a raw
    groupBy STDDEV_SAMP merges buffers in task-scheduling order, so its
    low bits vary run to run and can flake a 6-dp ROUND."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    lr = daily.withColumn("log_ret", M.log_return(F.col("close"), w))
    n = F.count(F.lit(1))
    s12 = F.sum(F.col("log_ret").cast("decimal(27,12)")).cast("double")
    ss = F.sum(
        (F.col("log_ret") * F.col("log_ret")).cast("decimal(27,12)")
    ).cast("double")
    sd = F.when(
        n > 1,
        F.sqrt(F.greatest((ss - s12 * s12 / n) / (n - 1), F.lit(0.0))),
    )
    return lr.filter(F.col("log_ret").isNotNull()).groupBy("suppkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.sum(F.col("log_ret").cast("decimal(27,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_log_ret"),
        F.round(sd, 6).alias("sd_log_ret"),
    )


def funcs_ewma_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive EWMA of close per supplier via applyInPandas
    (functions/timeseries.py) — the grouped-map surface. Oracle: a
    DuckDB recursive CTE replays the identical per-key recursion
    (value-exact, see ORACLE_SQL); the pandas recursion is additionally
    pinned by tests/test_pipeline.py."""
    from market_data_pipeline_databricks_spark.functions.timeseries import ewma

    daily = _daily(spark, sf_dir)
    out = ewma(daily, ["suppkey"], "day", "close", alpha=0.2, out_col="ewma_close")
    return out.select(
        "suppkey", "day", "close", F.round("ewma_close", 6).alias("ewma_close")
    )


def funcs_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier market beta + correlation — the statistical
    aggregate family (regr_slope, corr): daily simple returns per
    supplier regressed on the equal-weight cross-supplier mean return.

    Shape: one suppkey window builds returns; the market series is
    O(days) rows (decimal-summed mean: order-independent bits) and
    broadcasts; the final aggregation shuffles once on suppkey.

    Slope/corr are derived from decimal-cast component sums (Σx, Σy,
    Σxy, Σx², Σy²) instead of the native double-accumulating
    regr_slope/corr aggregates: the component sums are order-exact, so
    both engines compute the 6-dp values from identical bits and
    parity cannot flake near a rounding boundary (round-3 advice).
    NULL semantics match the native aggregates: zero x-variance →
    NULL beta; zero variance on either axis → NULL corr.
    """
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    r = daily.withColumn(
        "ret", F.col("close") / F.lag("close").over(w) - 1
    ).filter(F.col("ret").isNotNull())
    mkt = r.groupBy("day").agg(
        (
            F.sum(F.col("ret").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mkt_ret")
    )

    def dsum(col):
        return F.sum(col.cast("decimal(27,12)")).cast("double")

    comp = (
        r.join(F.broadcast(mkt), "day")
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            dsum(F.col("mkt_ret")).alias("sx"),
            dsum(F.col("ret")).alias("sy"),
            dsum(F.col("ret") * F.col("mkt_ret")).alias("sxy"),
            dsum(F.col("mkt_ret") * F.col("mkt_ret")).alias("sxx"),
            dsum(F.col("ret") * F.col("ret")).alias("syy"),
        )
    )
    n = F.col("n_days").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    beta = F.when(varx != 0, cov / varx)
    corr = F.when((varx > 0) & (vary > 0), cov / F.sqrt(varx * vary))
    return comp.select(
        "suppkey",
        "n_days",
        F.round(beta, 6).alias("beta"),
        F.round(corr, 6).alias("mkt_corr"),
    )


def funcs_rolling_median_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-day ROLLING MEDIAN of close per supplier — the robust price
    filter a quant desk runs beside the rolling mean (one bad print
    shifts a 20-day mean by 5%, the median not at all). The percentile
    aggregate rides the same bounded ROWS frame as the reference's
    rolling stddev/avg (`notebooks/gold/03_aggregate_gold.py:63-73`),
    so per-row state is O(20) and one suppkey exchange serves it."""
    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("suppkey")
        .orderBy("day")
        .rowsBetween(-19, 0)
    )
    return daily.select(
        "suppkey",
        "day",
        "close",
        F.round(F.expr("percentile(close, 0.5)").over(w), 6).alias(
            "median_close_20d"
        ),
    )


def funcs_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per key: running peak (cumulative max window)
    over the daily close series, then the most negative peak-to-trough
    ratio — the canonical risk metric downstream of the reference's
    gold feature table (03_aggregate_gold.py computes vol_20d; drawdown
    is the path-dependent complement).

    Scale: beyond the daily-grain collapse every feature query shares,
    ONE suppkey exchange serves both the cumulative-max window and the
    final per-key min — the aggregate's required partitioning is
    satisfied by the window's, so Catalyst inserts no third exchange
    (verified: 2 total Exchange nodes in the executed plan, the same
    count as the bare daily base + window). All math is
    max/division/min on raw doubles (no accumulation order
    dependence), rounded once at the end."""
    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("suppkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.withColumn("cummax", F.max("close").over(w))
    return dd.groupBy("suppkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.min(F.col("close") / F.col("cummax") - 1), 6).alias(
            "max_drawdown"
        ),
    )


def funcs_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per key per calendar month —
    the standard execution-quality benchmark. Numerator and
    denominator are decimal-exact sums (order-independent bits), the
    single division happens after aggregation, so both engines derive
    identical doubles.

    Scale: one hash-aggregate shuffle on (suppkey, month); map-side
    partial sums collapse the fact rows before the exchange."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("pv"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)"))
            .cast("double")
            .alias("v"),
        )
        .select(
            "suppkey",
            "month",
            # floor-truncate (see funcs_feature_panel): the quotient can
            # land on a half-way point where Spark and DuckDB round
            # differently; floor of x*1e6 is pure IEEE, identical bits.
            (F.floor(F.col("pv") / F.col("v") * 1e6) / 1e6).alias("vwap"),
            F.round(F.col("v"), 2).alias("volume"),
        )
    )


def funcs_weekly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the daily series to weekly OHLC bars per key — the
    canonical downsampling every charting/backtest layer needs
    (reference grain is daily, `docs/sql_contracts.md`; this is the
    aggregation that coarsens it without a window function).

    Scale: open/close are argmin/argmax aggregates (min_by/max_by on
    the day column — day is unique per key, so they are deterministic);
    high/low/volume are plain aggregates. Everything partial-aggregates
    map-side into one (suppkey, week) shuffle — no window, no sort."""
    daily = _daily(spark, sf_dir)
    wk = F.date_trunc("week", F.col("day")).cast("date").alias("week")
    return (
        daily.groupBy(F.col("suppkey"), wk)
        .agg(
            F.min_by("close", "day").alias("open"),
            F.max("close").alias("high"),
            F.min("close").alias("low"),
            F.max_by("close", "day").alias("close"),
            F.sum(F.col("volume").cast("decimal(27,2)"))
            .cast("double")
            .alias("volume"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


def funcs_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands per key in scale-free form: 20-day moving
    average, relative bandwidth 4σ/MA, and %B (where in the band the
    close sits) — the mean-reversion companion to the reference's
    vol_20d (`notebooks/gold/03_aggregate_gold.py:63-73`, same ROWS 19
    frame). Absolute edges are client arithmetic:
    upper/lower = MA·(1 ± bandwidth/2).

    Column discipline (the funcs_feature_panel rule): MA *and* σ both
    derive from decimal-exact frame sums (Σx, Σx² — bit-identical on
    both engines at any magnitude; the previously-raw windowed stddev
    was deterministic per engine but cross-engine divergent at ~1e-11,
    observed once in 53k rows at sf0.1), and every stddev-derived
    column is emitted as an O(1) RATIO. %B and bandwidth are NULL
    until the band has width (σ > 0, also NULL for the 1-row warmup
    frame) — matching on both engines. One suppkey exchange serves
    every column."""
    daily = _daily(spark, sf_dir)
    f = Window.partitionBy("suppkey").orderBy("day").rowsBetween(-19, 0)
    # Stage the frame aggregates as named columns FIRST: inlining
    # ma/sd into every output expression makes WindowExec evaluate
    # duplicate aggregates — Catalyst collapses window OPERATORS but
    # does not CSE duplicate window EXPRESSIONS. Two projections keep
    # it at two sums + one count in a single WindowExec.
    staged = daily.select(
        "suppkey",
        "day",
        "close",
        F.sum(F.col("close").cast("decimal(27,6)"))
        .over(f)
        .cast("double")
        .alias("_s"),
        F.sum((F.col("close") * F.col("close")).cast("decimal(27,6)"))
        .over(f)
        .cast("double")
        .alias("_ss"),
        F.count(F.lit(1)).over(f).alias("_n"),
    ).select(
        "suppkey",
        "day",
        "close",
        (F.col("_s") / F.col("_n")).alias("_ma"),
        F.when(
            F.col("_n") > 1,
            F.sqrt(
                F.greatest(
                    (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n"))
                    / (F.col("_n") - 1),
                    F.lit(0.0),
                )
            ),
        ).alias("_sd"),
    )
    ma, sd = F.col("_ma"), F.col("_sd")
    return staged.select(
        "suppkey",
        "day",
        "close",
        F.round(ma, 6).alias("ma_20d"),
        F.round(F.when(sd > 0, 4 * sd / ma), 6).alias("bandwidth"),
        F.round(
            F.when(sd > 0, (F.col("close") - (ma - 2 * sd)) / (4 * sd)), 6
        ).alias("pct_b"),
    )


def funcs_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (Cutler's SMA form) per key: average gain vs average
    loss over the trailing 14 observed daily changes, RSI = 100 −
    100/(1 + AG/AL); an all-gain frame pins RSI at 100. Cutler's SMA
    variant is window-expressible (Wilder's smoothing is the EWMA
    recursion — that surface is funcs_ewma_close / funcs_macd).

    Gains and losses are decimal-exact frame sums, so AG/AL and the
    final ratio derive from identical bits on both engines. RSI is
    emitted only for full 14-change frames (NULL during warmup — a
    14-day average over 3 points is not the indicator). One suppkey
    exchange: the change LAG and the frame sums share the window
    partitioning."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    chg = daily.withColumn(
        "chg", F.col("close") - F.lag("close").over(w)
    ).filter(F.col("chg").isNotNull())
    f = Window.partitionBy("suppkey").orderBy("day").rowsBetween(-13, 0)

    def dsum(col):
        return F.sum(col.cast("decimal(27,6)")).over(f).cast("double")

    # stage each frame aggregate once (see funcs_bollinger_bands: no
    # CSE across duplicate window expressions)
    staged = chg.select(
        "suppkey",
        "day",
        "close",
        (dsum(F.greatest(F.col("chg"), F.lit(0.0))) / 14).alias("_ag"),
        (dsum(F.greatest(-F.col("chg"), F.lit(0.0))) / 14).alias("_al"),
        F.count(F.lit(1)).over(f).alias("_n"),
    )
    ag, al = F.col("_ag"), F.col("_al")
    rsi = F.when(
        F.col("_n") == 14,
        F.when(al > 0, 100 - 100 / (1 + ag / al)).otherwise(100.0),
    )
    return staged.select(
        "suppkey", "day", "close", F.round(rsi, 6).alias("rsi_14")
    )


def funcs_cross_sectional_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional momentum deciles: each day, rank every supplier
    by 5-day momentum and bucket into NTILE(10) deciles, then report
    per-(day, decile) breadth and mean momentum — the long/short factor
    construction that reads ACROSS keys at a point in time, where every
    other feature query reads along one key through time.

    Two exchanges by construction: the momentum LAG partitions on
    suppkey, the decile ranking on day. The final aggregation adds no
    third — hash partitioning on ``day`` already co-locates every
    (day, decile) group. Momentum is pure IEEE arithmetic from
    identical inputs (bit-identical across engines) and NTILE is SQL
    standard with a suppkey tie-break, so the bucketing is
    deterministic; the decile mean runs through a decimal sum."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    mom = daily.withColumn(
        "mom", F.col("close") / F.lag("close", 5).over(w) - 1
    ).filter(F.col("mom").isNotNull())
    d = Window.partitionBy("day").orderBy(F.desc("mom"), F.asc("suppkey"))
    return (
        mom.withColumn("decile", F.ntile(10).over(d))
        .groupBy("day", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum(F.col("mom").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_mom"),
            F.round(F.min("mom"), 6).alias("worst_mom"),
            F.round(F.max("mom"), 6).alias("best_mom"),
        )
        .select(
            "day",
            F.col("decile").cast("long").alias("decile"),
            "n_suppliers",
            "mean_mom",
            "worst_mom",
            "best_mom",
        )
    )


def funcs_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) per key — three chained EWMA recursions
    (functions/timeseries.py:macd) in ONE applyInPandas pass, so the
    whole indicator costs a single suppkey shuffle. The grouped-map
    surface beyond a lone EWMA: recursions composed on a derived
    series (signal = EMA₉ of the fast−slow spread), which no window
    frame expresses. Oracle: DuckDB replays all three recursions as
    recursive CTEs with the identical alpha arithmetic
    (2/(span+1), old_wt = 1 − alpha as evaluated doubles), so the
    6-dp values derive from matching bits (funcs_ewma_close
    precedent)."""
    from market_data_pipeline_databricks_spark.functions.timeseries import (
        macd as _macd,
    )

    daily = _daily(spark, sf_dir).select("suppkey", "day", "close")
    out = _macd(daily, ["suppkey"], "day", "close", fast=12, slow=26, signal=9)
    return out.select(
        "suppkey",
        "day",
        "close",
        F.round("ema_fast", 6).alias("ema12"),
        F.round("ema_slow", 6).alias("ema26"),
        F.round("macd", 6).alias("macd"),
        F.round("signal", 6).alias("macd_signal"),
        F.round("hist", 6).alias("macd_hist"),
    )


def funcs_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratios per key from daily log
    returns — the two headline risk-adjusted-return numbers a desk
    reads next to max_drawdown. Sharpe = mean/σ·√252; Sortino divides
    by DOWNSIDE deviation (√ of the mean squared negative return), the
    semideviation form.

    Mean, downside-sum AND σ all derive from decimal-exact sums (Σx,
    Σx² — order-independent bits; a raw groupBy STDDEV_SAMP merges
    aggregation buffers in task-scheduling order, so its low bits vary
    run to run and can flake a 6-dp ROUND). Zero deviation → NULL
    ratio on both engines. One suppkey exchange: the return LAG and
    the final aggregate share the partitioning."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    lr = daily.withColumn("log_ret", M.log_return(F.col("close"), w)).filter(
        F.col("log_ret").isNotNull()
    )

    def dsum(col):
        return F.sum(col.cast("decimal(27,12)")).cast("double")

    comp = lr.groupBy("suppkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum(F.col("log_ret")).alias("s"),
        dsum(
            F.when(F.col("log_ret") < 0, F.col("log_ret") * F.col("log_ret"))
            .otherwise(0.0)
        ).alias("dsq"),
        dsum(F.col("log_ret") * F.col("log_ret")).alias("ss"),
    )
    comp = comp.withColumn(
        "sd",
        F.when(
            F.col("n_days") > 1,
            F.sqrt(
                F.greatest(
                    (F.col("ss") - F.col("s") * F.col("s") / F.col("n_days"))
                    / (F.col("n_days") - 1),
                    F.lit(0.0),
                )
            ),
        ),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s") / n
    downside = F.sqrt(F.col("dsq") / n)
    ann = F.sqrt(F.lit(252.0))
    return comp.select(
        "suppkey",
        "n_days",
        F.round(F.when(F.col("sd") > 0, mean / F.col("sd") * ann), 6).alias(
            "sharpe"
        ),
        F.round(F.when(downside > 0, mean / downside * ann), 6).alias(
            "sortino"
        ),
    )


def funcs_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week return seasonality across the whole market: mean
    daily return, breadth and positive share per weekday — the
    calendar-anomaly diagnostic (is there a 'Monday effect' in this
    corpus). Cross-key aggregation over the per-key return series;
    dow is 0=Sunday..6=Saturday (Spark ``dayofweek``−1 = DuckDB
    ``dayofweek``, pinned explicitly since the two engines' native
    conventions differ by one).

    One suppkey exchange for the LAG, one 7-key aggregate — partial
    aggregation collapses everything map-side."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("day")
    r = daily.withColumn(
        "ret", F.col("close") / F.lag("close").over(w) - 1
    ).filter(F.col("ret").isNotNull())
    return (
        r.groupBy((F.dayofweek("day") - 1).cast("long").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(
                F.sum(F.col("ret").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ret"),
            F.round(
                F.sum((F.col("ret") > 0).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("pos_share"),
        )
    )


def funcs_atr_parkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-based risk features: 14-row average true range (Wilder's
    TR extended over the prior-close gap) and 20-row Parkinson
    volatility (ln(high/low)² estimator) over the per-supplier daily
    OHLC bars. Close is the decimal-exact daily mean so it sits
    strictly inside [low, high] and differs from both (max/min/avg are
    all order-independent, so the derived bars are engine-identical).

    Scale: one (suppkey, day) aggregate off the fact scan, then a
    single suppkey exchange serves the LAG and both rolling frames in
    one WindowExec — the same one-shuffle-many-features discipline as
    funcs_feature_panel."""
    li = _t(spark, sf_dir, "lineitem")
    bars = li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(
        F.max("l_extendedprice").alias("high"),
        F.min("l_extendedprice").alias("low"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("close"),
    )
    w = Window.partitionBy("suppkey").orderBy("day")
    # floor-truncate, not ROUND: rolling means of doubles can land on
    # exact half-way points where the engines' tie rules differ (the
    # same discipline as funcs_feature_panel's vwap)
    return bars.select(
        "suppkey",
        "day",
        (
            F.floor(
                M.atr(F.col("high"), F.col("low"), F.col("close"), w, 14)
                * 1e6
            )
            / 1e6
        ).alias("atr_14"),
        (
            F.floor(M.parkinson_vol(F.col("high"), F.col("low"), w, 20) * 1e6)
            / 1e6
        ).alias("parkinson_20"),
    )


QUERIES = {
    "funcs_atr_parkinson": funcs_atr_parkinson,
    "funcs_max_drawdown": funcs_max_drawdown,
    "funcs_vwap_monthly": funcs_vwap_monthly,
    "funcs_weekly_ohlc": funcs_weekly_ohlc,
    "funcs_feature_panel": funcs_feature_panel,
    "funcs_log_return_stats": funcs_log_return_stats,
    "funcs_ewma_close": funcs_ewma_close,
    "funcs_market_beta": funcs_market_beta,
    "funcs_rolling_median_close": funcs_rolling_median_close,
    "funcs_bollinger_bands": funcs_bollinger_bands,
    "funcs_rsi": funcs_rsi,
    "funcs_cross_sectional_momentum": funcs_cross_sectional_momentum,
    "funcs_macd": funcs_macd,
    "funcs_sharpe_sortino": funcs_sharpe_sortino,
    "funcs_dow_seasonality": funcs_dow_seasonality,
}

_DAILY_CTE = """
WITH daily AS (
  SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
         MAX(l_extendedprice) AS close, SUM(l_quantity) AS volume
  FROM lineitem GROUP BY 1, 2
)
"""

ORACLE_SQL = {
    "funcs_atr_parkinson": """
        WITH bars AS (
          SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
                 MAX(l_extendedprice) AS high,
                 MIN(l_extendedprice) AS low,
                 ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6)))
                            AS DOUBLE) / COUNT(*), 6) AS close
          FROM lineitem GROUP BY 1, 2
        ), tr AS (
          SELECT suppkey, day, high, low,
                 COALESCE(GREATEST(high - low,
                                   ABS(high - LAG(close) OVER w),
                                   ABS(low - LAG(close) OVER w)),
                          high - low) AS true_range
          FROM bars
          WINDOW w AS (PARTITION BY suppkey ORDER BY day)
        )
        SELECT suppkey, day,
               FLOOR(AVG(true_range) OVER (PARTITION BY suppkey ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) * 1e6) / 1e6
                 AS atr_14,
               FLOOR(SQRT(AVG(POW(LN(high / low), 2))
                          OVER (PARTITION BY suppkey ORDER BY day
                                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                          / (4 * LN(2))) * 1e6) / 1e6 AS parkinson_20
        FROM tr
    """,
    "funcs_max_drawdown": _DAILY_CTE + """
        , dd AS (
          SELECT suppkey, day, close,
                 MAX(close) OVER (PARTITION BY suppkey ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
          FROM daily
        )
        SELECT suppkey, COUNT(*) AS n_days,
               ROUND(MIN(close / cummax - 1), 6) AS max_drawdown
        FROM dd GROUP BY suppkey
    """,
    "funcs_weekly_ohlc": _DAILY_CTE + """
        SELECT suppkey,
               CAST(date_trunc('week', day) AS DATE) AS week,
               arg_min(close, day) AS open,
               MAX(close) AS high,
               MIN(close) AS low,
               arg_max(close, day) AS close,
               CAST(SUM(CAST(volume AS DECIMAL(27,2))) AS DOUBLE) AS volume,
               COUNT(*) AS n_days
        FROM daily
        GROUP BY 1, 2
    """,
    "funcs_vwap_monthly": """
        SELECT l_suppkey AS suppkey,
               CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
               FLOOR(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) * 1e6) / 1e6 AS vwap,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE), 2) AS volume
        FROM lineitem
        GROUP BY 1, 2
    """,
    "funcs_rolling_median_close": _DAILY_CTE + """
        SELECT suppkey, day, close,
               ROUND(quantile_cont(close, 0.5) OVER (
                 PARTITION BY suppkey ORDER BY day
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS median_close_20d
        FROM daily
    """,
    "funcs_market_beta": _DAILY_CTE + """
        , r AS (
          SELECT suppkey, day,
                 close / LAG(close) OVER (PARTITION BY suppkey ORDER BY day) - 1 AS ret
          FROM daily
        ),
        rr AS (SELECT * FROM r WHERE ret IS NOT NULL),
        mkt AS (
          SELECT day,
                 CAST(SUM(CAST(ret AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS mkt_ret
          FROM rr GROUP BY day
        )
        , comp AS (
          SELECT suppkey, COUNT(*) AS n_days,
                 CAST(SUM(CAST(mkt_ret AS DECIMAL(27,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(ret AS DECIMAL(27,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ret * mkt_ret AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(mkt_ret * mkt_ret AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ret * ret AS DECIMAL(27,12))) AS DOUBLE) AS syy
          FROM rr JOIN mkt USING (day)
          GROUP BY suppkey
        )
        SELECT suppkey, n_days,
               ROUND(CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx <> 0
                          THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                               / (CAST(n_days AS DOUBLE) * sxx - sx * sx)
                     END, 6) AS beta,
               ROUND(CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0
                           AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0
                          THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                               / SQRT((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                                      * (CAST(n_days AS DOUBLE) * syy - sy * sy))
                     END, 6) AS mkt_corr
        FROM comp
    """,
    "funcs_feature_panel": _DAILY_CTE + """
        SELECT suppkey, day, close,
               FLOOR(CAST(SUM(CAST(close * volume AS DECIMAL(27,6))) OVER f AS DOUBLE)
                     / CAST(SUM(CAST(volume AS DECIMAL(27,6))) OVER f AS DOUBLE) * 1e6) / 1e6 AS vwap_20d,
               ROUND(close / MAX(close) OVER cum - 1, 6) AS drawdown,
               ROUND(CASE WHEN STDDEV_SAMP(close) OVER f > 0
                          THEN (close - AVG(close) OVER f) / STDDEV_SAMP(close) OVER f
                     END, 6) AS zscore_20d,
               ROUND(close / LAG(close, 5) OVER w - 1, 6) AS momentum_5d
        FROM daily
        WINDOW w AS (PARTITION BY suppkey ORDER BY day),
               f AS (PARTITION BY suppkey ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
               cum AS (PARTITION BY suppkey ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "funcs_sharpe_sortino": _DAILY_CTE + """
        , lr AS (
          SELECT suppkey,
                 LN(close / LAG(close) OVER (PARTITION BY suppkey ORDER BY day)) AS log_ret
          FROM daily
        ), l AS (SELECT * FROM lr WHERE log_ret IS NOT NULL),
        comp0 AS (
          SELECT suppkey, COUNT(*) AS n_days,
                 CAST(SUM(CAST(log_ret AS DECIMAL(27,12))) AS DOUBLE) AS s,
                 CAST(SUM(CAST(CASE WHEN log_ret < 0 THEN log_ret * log_ret
                                    ELSE 0.0 END AS DECIMAL(27,12))) AS DOUBLE) AS dsq,
                 CAST(SUM(CAST(log_ret * log_ret AS DECIMAL(27,12)))
                      AS DOUBLE) AS ss
          FROM l GROUP BY suppkey
        ),
        comp AS (
          SELECT *,
                 CASE WHEN n_days > 1 THEN SQRT(GREATEST(
                   (ss - s * s / n_days) / (n_days - 1), 0.0)) END AS sd
          FROM comp0
        )
        SELECT suppkey, n_days,
               ROUND(CASE WHEN sd > 0
                          THEN (s / CAST(n_days AS DOUBLE)) / sd * SQRT(252.0)
                     END, 6) AS sharpe,
               ROUND(CASE WHEN SQRT(dsq / CAST(n_days AS DOUBLE)) > 0
                          THEN (s / CAST(n_days AS DOUBLE))
                               / SQRT(dsq / CAST(n_days AS DOUBLE)) * SQRT(252.0)
                     END, 6) AS sortino
        FROM comp
    """,
    "funcs_dow_seasonality": _DAILY_CTE + """
        , r AS (
          SELECT suppkey, day,
                 close / LAG(close) OVER (PARTITION BY suppkey ORDER BY day) - 1 AS ret
          FROM daily
        ), rr AS (SELECT * FROM r WHERE ret IS NOT NULL)
        SELECT CAST(dayofweek(day) AS BIGINT) AS dow,
               COUNT(*) AS n_obs,
               ROUND(CAST(SUM(CAST(ret AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_ret,
               ROUND(CAST(SUM(CASE WHEN ret > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS pos_share
        FROM rr GROUP BY 1
    """,
    "funcs_log_return_stats": _DAILY_CTE + """
        , lr AS (
          SELECT suppkey, LN(close / LAG(close) OVER (PARTITION BY suppkey ORDER BY day)) AS log_ret
          FROM daily
        )
        SELECT suppkey, COUNT(*) AS n_days,
               ROUND(CAST(SUM(CAST(log_ret AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*), 6) AS mean_log_ret,
               ROUND(CASE WHEN COUNT(*) > 1 THEN SQRT(GREATEST(
                 (CAST(SUM(CAST(log_ret * log_ret AS DECIMAL(27,12))) AS DOUBLE)
                  - CAST(SUM(CAST(log_ret AS DECIMAL(27,12))) AS DOUBLE)
                    * CAST(SUM(CAST(log_ret AS DECIMAL(27,12))) AS DOUBLE)
                    / COUNT(*))
                 / (COUNT(*) - 1), 0.0)) END, 6) AS sd_log_ret
        FROM lr WHERE log_ret IS NOT NULL GROUP BY suppkey
    """,
    # Recursive CTE reproduces the applyInPandas recursion exactly:
    # e[0] = x[0]; e[t] = 0.2*x[t] + 0.8*e[t-1]. Input close is NULL-free
    # (MAX over a NOT NULL column) so the plain recursion is the whole
    # contract; pandas ewm(adjust=False) evaluates the identical
    # old_wt*prev + new_wt*cur expression, and ROUND(,6) absorbs any
    # last-ulp divergence.
    "funcs_bollinger_bands": _DAILY_CTE + """
        , staged AS (
          SELECT suppkey, day, close,
                 CAST(SUM(CAST(close AS DECIMAL(27,6))) OVER f AS DOUBLE) AS s,
                 CAST(SUM(CAST(close * close AS DECIMAL(27,6))) OVER f
                      AS DOUBLE) AS ss,
                 COUNT(*) OVER f AS n
          FROM daily
          WINDOW f AS (PARTITION BY suppkey ORDER BY day
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        ), msd AS (
          SELECT suppkey, day, close, s / n AS ma,
                 CASE WHEN n > 1 THEN SQRT(GREATEST(
                   (ss - s * s / n) / (n - 1), 0.0)) END AS sd
          FROM staged
        )
        SELECT suppkey, day, close,
               ROUND(ma, 6) AS ma_20d,
               ROUND(CASE WHEN sd > 0 THEN 4 * sd / ma END, 6) AS bandwidth,
               ROUND(CASE WHEN sd > 0
                          THEN (close - (ma - 2 * sd)) / (4 * sd)
                     END, 6) AS pct_b
        FROM msd
    """,
    "funcs_rsi": _DAILY_CTE + """
        , chg AS (
          SELECT suppkey, day, close,
                 close - LAG(close) OVER (PARTITION BY suppkey ORDER BY day) AS chg
          FROM daily
        ), c AS (SELECT * FROM chg WHERE chg IS NOT NULL)
        SELECT suppkey, day, close,
               ROUND(CASE WHEN COUNT(*) OVER f = 14 THEN
                 CASE WHEN CAST(SUM(CAST(GREATEST(-chg, 0.0) AS DECIMAL(27,6))) OVER f AS DOUBLE) / 14 > 0
                      THEN 100 - 100 / (1 + (CAST(SUM(CAST(GREATEST(chg, 0.0) AS DECIMAL(27,6))) OVER f AS DOUBLE) / 14)
                                            / (CAST(SUM(CAST(GREATEST(-chg, 0.0) AS DECIMAL(27,6))) OVER f AS DOUBLE) / 14))
                      ELSE 100.0 END
               END, 6) AS rsi_14
        FROM c
        WINDOW f AS (PARTITION BY suppkey ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    "funcs_cross_sectional_momentum": _DAILY_CTE + """
        , m AS (
          SELECT suppkey, day,
                 close / LAG(close, 5) OVER (PARTITION BY suppkey ORDER BY day) - 1 AS mom
          FROM daily
        ), mm AS (SELECT * FROM m WHERE mom IS NOT NULL),
        d AS (
          SELECT day, mom,
                 NTILE(10) OVER (PARTITION BY day ORDER BY mom DESC, suppkey ASC) AS decile
          FROM mm
        )
        SELECT day, CAST(decile AS BIGINT) AS decile,
               COUNT(*) AS n_suppliers,
               ROUND(CAST(SUM(CAST(mom AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS mean_mom,
               ROUND(MIN(mom), 6) AS worst_mom,
               ROUND(MAX(mom), 6) AS best_mom
        FROM d GROUP BY day, decile
    """,
    # ONE recursion carries all three EWMA states (e12, e26, sig) per
    # step — chained recursive CTEs re-evaluate their inputs per
    # iteration in DuckDB (quadratic blowup); advancing the full state
    # vector on the shared rn is linear and replays
    # functions/timeseries.py:macd exactly: alpha = 2/(span+1) and
    # old_wt = 1 - alpha as evaluated doubles, macd = e12 − e26 at each
    # step, sig recursing on that spread (sig[0] = macd[0]). Every
    # term's bits match pandas and ROUND(,6) absorbs last-ulp
    # divergence (funcs_ewma_close precedent).
    "funcs_macd": """
        WITH RECURSIVE daily AS (
          SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
                 MAX(l_extendedprice) AS close
          FROM lineitem GROUP BY 1, 2
        ),
        ord AS (
          SELECT suppkey, day, close,
                 ROW_NUMBER() OVER (PARTITION BY suppkey ORDER BY day) AS rn
          FROM daily
        ),
        rec AS (
          SELECT suppkey, day, close, rn,
                 close AS e12, close AS e26, close - close AS sig
          FROM ord WHERE rn = 1
          UNION ALL
          SELECT o.suppkey, o.day, o.close, o.rn,
                 (2.0/13.0) * o.close + (1 - 2.0/13.0) * r.e12,
                 (2.0/27.0) * o.close + (1 - 2.0/27.0) * r.e26,
                 (2.0/10.0) * ((2.0/13.0) * o.close + (1 - 2.0/13.0) * r.e12
                               - ((2.0/27.0) * o.close + (1 - 2.0/27.0) * r.e26))
                 + (1 - 2.0/10.0) * r.sig
          FROM ord o JOIN rec r ON o.suppkey = r.suppkey AND o.rn = r.rn + 1
        )
        SELECT suppkey, day, close,
               ROUND(e12, 6) AS ema12,
               ROUND(e26, 6) AS ema26,
               ROUND(e12 - e26, 6) AS macd,
               ROUND(sig, 6) AS macd_signal,
               ROUND(e12 - e26 - sig, 6) AS macd_hist
        FROM rec
    """,
    "funcs_ewma_close": """
        WITH RECURSIVE daily AS (
          SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
                 MAX(l_extendedprice) AS close
          FROM lineitem GROUP BY 1, 2
        ),
        ord AS (
          SELECT suppkey, day, close,
                 ROW_NUMBER() OVER (PARTITION BY suppkey ORDER BY day) AS rn
          FROM daily
        ),
        rec AS (
          SELECT suppkey, day, close, rn, close AS ewma FROM ord WHERE rn = 1
          UNION ALL
          SELECT o.suppkey, o.day, o.close, o.rn, 0.2 * o.close + 0.8 * r.ewma
          FROM ord o JOIN rec r ON o.suppkey = r.suppkey AND o.rn = r.rn + 1
        )
        SELECT suppkey, day, close, ROUND(ewma, 6) AS ewma_close FROM rec
    """,
}


def funcs_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector per key over daily returns
    (functions/timeseries.py:cusum, Page 1954): s+ accumulates
    sustained upward drift beyond a 2% slack band, s- downward;
    an alarm fires when either statistic escapes ±10%. A clamped
    recursion no window frame expresses — the third resident of the
    grouped-map surface beside EWMA and MACD, one suppkey shuffle.
    Oracle: DuckDB replays the identical GREATEST/LEAST recursion as a
    recursive CTE (funcs_macd precedent), so the 6-dp values derive
    from matching bits."""
    from market_data_pipeline_databricks_spark.functions.timeseries import (
        cusum,
    )

    daily = _daily(spark, sf_dir).select("suppkey", "day", "close")
    w = Window.partitionBy("suppkey").orderBy("day")
    r = (
        daily.withColumn(
            "ret", F.col("close") / F.lag("close").over(w) - 1
        )
        .filter(F.col("ret").isNotNull())
        .select("suppkey", "day", "ret")
    )
    out = cusum(r, ["suppkey"], "day", "ret", slack=0.02)
    return out.select(
        "suppkey",
        "day",
        F.round("ret", 6).alias("ret"),
        F.round("cusum_pos", 6).alias("cusum_pos"),
        F.round("cusum_neg", 6).alias("cusum_neg"),
        (
            (F.col("cusum_pos") > 0.1) | (F.col("cusum_neg") < -0.1)
        ).alias("drift_alarm"),
    )


QUERIES.update({"funcs_cusum_drift": funcs_cusum_drift})

ORACLE_SQL.update(
    {
        "funcs_cusum_drift": """
            WITH RECURSIVE daily AS (
              SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
                     MAX(l_extendedprice) AS close
              FROM lineitem GROUP BY 1, 2
            ),
            r0 AS (
              SELECT suppkey, day,
                     close / LAG(close) OVER (PARTITION BY suppkey ORDER BY day) - 1 AS ret
              FROM daily
            ),
            r AS (
              SELECT suppkey, day, ret,
                     ROW_NUMBER() OVER (PARTITION BY suppkey ORDER BY day) AS rn
              FROM r0 WHERE ret IS NOT NULL
            ),
            rec AS (
              SELECT suppkey, day, ret, rn,
                     GREATEST(0.0, 0.0 + ret - 0.02) AS sp,
                     LEAST(0.0, 0.0 + ret + 0.02) AS sn
              FROM r WHERE rn = 1
              UNION ALL
              SELECT o.suppkey, o.day, o.ret, o.rn,
                     GREATEST(0.0, rec.sp + o.ret - 0.02),
                     LEAST(0.0, rec.sn + o.ret + 0.02)
              FROM rec JOIN r o
                ON o.suppkey = rec.suppkey AND o.rn = rec.rn + 1
            )
            SELECT suppkey, day, ROUND(ret, 6) AS ret,
                   ROUND(sp, 6) AS cusum_pos,
                   ROUND(sn, 6) AS cusum_neg,
                   (sp > 0.1 OR sn < -0.1) AS drift_alarm
            FROM rec
        """,
    }
)


def funcs_pairwise_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series return CORRELATION MATRIX (upper triangle) over a
    fixed 8-series universe — the risk-model building block beside the
    single-factor ``funcs_market_beta`` (a desk estimates pairwise
    co-movement for portfolio variance, not just factor loadings).

    Shape: daily returns per series (one suppkey window), then a
    DAY-keyed self-join pairs the aligned return vectors (fan-out is
    |universe|² per day, bounded by the explicit universe filter — at
    100 TB the universe selection is the knob, the join stays day-
    keyed so no series ever collides with the whole corpus), and one
    (a, b) groupBy folds the component sums. Correlation derives from
    decimal-cast component sums (Σx, Σy, Σxy, Σx², Σy²) like the beta
    query — order-exact bits in both engines, so the 6-dp round
    cannot flake (round-3 advice, same rationale). Zero variance on
    either axis → NULL correlation (native corr semantics); pairs
    need ≥ 30 aligned days (estimation floor)."""
    daily = _daily(spark, sf_dir).filter(F.col("suppkey") <= 8)
    w = Window.partitionBy("suppkey").orderBy("day")
    r = daily.withColumn(
        "ret", F.col("close") / F.lag("close").over(w) - 1
    ).filter(F.col("ret").isNotNull())
    a = r.select(
        F.col("suppkey").alias("sk_a"), "day", F.col("ret").alias("ra")
    )
    b = r.select(
        F.col("suppkey").alias("sk_b"), "day", F.col("ret").alias("rb")
    )

    def dsum(col):
        return F.sum(col.cast("decimal(27,12)")).cast("double")

    comp = (
        a.join(b, "day")
        .filter(F.col("sk_a") < F.col("sk_b"))
        .groupBy("sk_a", "sk_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            dsum(F.col("ra")).alias("sx"),
            dsum(F.col("rb")).alias("sy"),
            dsum(F.col("ra") * F.col("rb")).alias("sxy"),
            dsum(F.col("ra") * F.col("ra")).alias("sxx"),
            dsum(F.col("rb") * F.col("rb")).alias("syy"),
        )
        .filter(F.col("n_days") >= 30)
    )
    n = F.col("n_days").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when((varx > 0) & (vary > 0), cov / F.sqrt(varx * vary))
    return comp.select(
        "sk_a",
        "sk_b",
        "n_days",
        F.round(corr, 6).alias("ret_corr"),
    )


QUERIES.update({"funcs_pairwise_correlation": funcs_pairwise_correlation})

ORACLE_SQL.update(
    {
        "funcs_pairwise_correlation": _DAILY_CTE + """
        , r AS (
          SELECT suppkey, day,
                 close / LAG(close) OVER (PARTITION BY suppkey ORDER BY day) - 1 AS ret
          FROM daily WHERE suppkey <= 8
        ),
        rr AS (SELECT * FROM r WHERE ret IS NOT NULL),
        comp AS (
          SELECT a.suppkey AS sk_a, b.suppkey AS sk_b,
                 COUNT(*) AS n_days,
                 CAST(SUM(CAST(a.ret AS DECIMAL(27,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(b.ret AS DECIMAL(27,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(a.ret * b.ret AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(a.ret * a.ret AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(b.ret * b.ret AS DECIMAL(27,12))) AS DOUBLE) AS syy
          FROM rr a JOIN rr b ON a.day = b.day AND a.suppkey < b.suppkey
          GROUP BY 1, 2
          HAVING COUNT(*) >= 30
        )
        SELECT sk_a, sk_b, n_days,
               ROUND(CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0
                           AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0
                     THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                          / sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                                 * (CAST(n_days AS DOUBLE) * syy - sy * sy))
                     END, 6) AS ret_corr
        FROM comp
    """,
    }
)
