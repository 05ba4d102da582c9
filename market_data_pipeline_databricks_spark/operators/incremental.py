"""Incremental aggregate maintenance: mergeable partial rollups.

The pattern that keeps a daily/hourly summary table cheap at 100 TB:
instead of recomputing ``GROUP BY`` over the whole fact history when a
new partition lands, keep the rollup in MERGEABLE component form
(count / decimal sum / sum-of-squares / min / max per measure), fold
the new partition's partial rollup into it with one bounded-size
merge, and derive the presentation metrics (avg, stddev) only at read
time. Algebraically this is exactly what Spark's own partial
aggregation does *within* one job (map-side combine → final merge) —
lifted to *across* jobs, so the daily increment touches O(new
partition) + O(groups), never O(history).

Decimal components keep every merge order-independent: merging
day-by-day, all-at-once, or in any tree shape yields bit-identical
results (asserted by the property tests), which is what makes the
summary table safely idempotent to backfill in any order.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_DEC = "decimal(38,6)"
_SQ_DEC = "decimal(38,12)"


def partial_rollup(
    df: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Aggregate ``df`` into mergeable components per key: row count
    plus (sum, sumsq, min, max, non-null count) per measure. One
    shuffle on the keys; output is O(groups)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        c = F.col(m)
        aggs += [
            F.sum(c.cast(_SUM_DEC)).alias(f"{m}_sum"),
            F.sum((c * c).cast(_SQ_DEC)).alias(f"{m}_sumsq"),
            F.min(c).alias(f"{m}_min"),
            F.max(c).alias(f"{m}_max"),
            F.count(c).alias(f"{m}_n"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    rollups: list[DataFrame], keys: list[str], measures: list[str]
) -> DataFrame:
    """Fold any number of partial rollups into one: union (cheap — the
    inputs are already O(groups)) then re-aggregate the components
    with their merge functions (sum for counts/sums, min/max for
    bounds). Associative and commutative, so callers may merge in any
    order or tree shape."""
    unioned = reduce(lambda a, b: a.unionByName(b), rollups)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_sum").cast(_SUM_DEC).alias(f"{m}_sum"),
            F.sum(f"{m}_sumsq").cast(_SQ_DEC).alias(f"{m}_sumsq"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
            F.sum(f"{m}_n").alias(f"{m}_n"),
        ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_rollup(
    rollup: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Derive presentation metrics from the components: avg (decimal
    sum / count) and sample stddev (from n, sum, sumsq). NULL when the
    group has <1 (avg) or <2 (stddev) non-null values."""
    cols = [*(F.col(k) for k in keys), F.col("n_rows")]
    for m in measures:
        n = F.col(f"{m}_n")
        s = F.col(f"{m}_sum").cast("double")
        sq = F.col(f"{m}_sumsq").cast("double")
        avg = F.when(n > 0, s / n)
        var = F.when(n > 1, (sq - s * s / n) / (n - 1))
        cols += [
            F.round(avg, 6).alias(f"{m}_avg"),
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias(
                f"{m}_stddev"
            ),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
            n.alias(f"{m}_n"),
        ]
    return rollup.select(*cols)
