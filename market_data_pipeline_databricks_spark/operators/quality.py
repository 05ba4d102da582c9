"""Data-quality framework: gap / jump / staleness / row-count checks.

Re-expresses reference notebooks/gold/04_data_quality_checks.py (Q1-Q4
in SURVEY §2.11) as parameterized pure functions, each returning rows in
the ``data_quality_checks`` schema. Thresholds come from
``config.QualityThresholds`` (reference hardcodes them at :15-17);
``run_ts`` and ``today`` are injectable for determinism (reference uses
current_timestamp/current_date at :40,110).
"""

from __future__ import annotations

from datetime import date, datetime
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.config import QualityThresholds

_DQ_COLS = [
    "run_ts", "layer", "check_name", "symbol", "check_status",
    "metric_value", "threshold", "details",
]


def _finish(df: DataFrame, run_ts: datetime, layer: str, check: str) -> DataFrame:
    return df.select(
        F.lit(run_ts).cast("timestamp").alias("run_ts"),
        F.lit(layer).alias("layer"),
        F.lit(check).alias("check_name"),
        F.col("symbol").cast("string").alias("symbol"),
        F.col("check_status").cast("string").alias("check_status"),
        F.col("metric_value").cast("double").alias("metric_value"),
        F.col("threshold").cast("double").alias("threshold"),
        F.col("details").cast("string").alias("details"),
    )


def gap_checks(
    silver: DataFrame, run_ts: datetime, thresholds: QualityThresholds = QualityThresholds()
) -> DataFrame:
    """Q1 — trading-day gap: DATEDIFF(date, prev date) > gap_days
    (reference :43-74). Calendar days; no exchange calendar assumed."""
    w = Window.partitionBy("symbol").orderBy("date")
    gaps = (
        silver.select("symbol", "date")
        .withColumn("prev_date", F.lag("date").over(w))
        .withColumn("gap_days", F.datediff("date", F.col("prev_date")))
        .filter(F.col("gap_days") > thresholds.gap_days)
        .select(
            "symbol",
            F.lit("FAIL").alias("check_status"),
            F.col("gap_days").cast("double").alias("metric_value"),
            F.lit(float(thresholds.gap_days)).alias("threshold"),
            F.concat(
                F.lit("gap of "), F.col("gap_days").cast("string"),
                F.lit(" days ending "), F.col("date").cast("string"),
            ).alias("details"),
        )
    )
    return _finish(gaps, run_ts, "silver", "missing_trading_days_gap")


def jump_checks(
    gold: DataFrame, run_ts: datetime, thresholds: QualityThresholds = QualityThresholds()
) -> DataFrame:
    """Q2 — sudden price jump: ABS(return_1d) > abs_return; NULL returns
    excluded; FAIL rows only (reference :77-92)."""
    jumps = (
        gold.filter(
            F.col("return_1d").isNotNull()
            & (F.abs("return_1d") > thresholds.abs_return)
        )
        .select(
            "symbol",
            F.lit("FAIL").alias("check_status"),
            F.abs("return_1d").cast("double").alias("metric_value"),
            F.lit(thresholds.abs_return).alias("threshold"),
            F.concat(
                F.lit("abs return "), F.round(F.abs("return_1d"), 6).cast("string"),
                F.lit(" on "), F.col("date").cast("string"),
            ).alias("details"),
        )
    )
    return _finish(jumps, run_ts, "gold", "sudden_price_jump")


def stale_checks(
    silver: DataFrame,
    run_ts: datetime,
    today: date | None = None,
    thresholds: QualityThresholds = QualityThresholds(),
) -> DataFrame:
    """Q3 — staleness: DATEDIFF(today, MAX(date) per symbol) > stale_days
    (reference :95-124). ``today`` injectable (reference: CURRENT_DATE)."""
    today_col = F.lit(today).cast("date") if today is not None else F.current_date()
    stale = (
        silver.groupBy("symbol")
        .agg(F.max("date").alias("latest_date"))
        .withColumn("days_stale", F.datediff(today_col, F.col("latest_date")))
        .filter(F.col("days_stale") > thresholds.stale_days)
        .select(
            "symbol",
            F.lit("FAIL").alias("check_status"),
            F.col("days_stale").cast("double").alias("metric_value"),
            F.lit(float(thresholds.stale_days)).alias("threshold"),
            F.concat(
                F.lit("latest date "), F.col("latest_date").cast("string"),
                F.lit(" is "), F.col("days_stale").cast("string"), F.lit(" days old"),
            ).alias("details"),
        )
    )
    return _finish(stale, run_ts, "silver", "stale_data")


def row_count_check(
    spark_counts: dict[str, int], run_ts: datetime, spark=None
) -> DataFrame:
    """Q4 — heartbeat: one PASS row concatenating layer counts
    (reference :127-143); NULL symbol/metric/threshold."""
    from market_data_pipeline_databricks_spark.session import get_spark

    spark = spark or get_spark()
    details = ", ".join(f"{k}={v}" for k, v in sorted(spark_counts.items()))
    row = spark.createDataFrame(
        [(None, "PASS", None, None, f"row counts: {details}")],
        "symbol string, check_status string, metric_value double, threshold double, details string",
    )
    return _finish(row, run_ts, "pipeline", "row_counts")


def run_quality(
    silver: DataFrame,
    gold: DataFrame,
    counts: dict[str, int],
    run_ts: datetime | None = None,
    today: date | None = None,
    thresholds: QualityThresholds = QualityThresholds(),
    spark=None,
) -> DataFrame:
    """UNION ALL of all check streams (U1, reference :147-156)."""
    run_ts = run_ts or datetime.utcnow()
    frames = [
        gap_checks(silver, run_ts, thresholds),
        jump_checks(gold, run_ts, thresholds),
        stale_checks(silver, run_ts, today, thresholds),
        row_count_check(counts, run_ts, spark=spark),
    ]
    return reduce(lambda a, b: a.unionByName(b), frames).select(*_DQ_COLS)
