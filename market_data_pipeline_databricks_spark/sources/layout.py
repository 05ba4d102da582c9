"""Z-order data layout: multi-dimensional clustering for parquet
data-skipping, the OPTIMIZE ZORDER BY analogue for a plain parquet
lake (public technique: Morton-order space-filling curves, as used by
Delta Lake's OPTIMIZE and Databricks' liquid clustering — reimplemented
here from the published idea, no proprietary code).

Why it matters at 100 TB: min/max footer stats prune files only when
values are clustered. A sort on column A gives perfect pruning on A
and none on B; interleaving the bits of both columns' rank buckets
gives good (bounded-loss) pruning on EVERY z-ordered column at once,
so selective filters on any of them skip most files.

Scale shape:
- Bucket boundaries come from ``approxQuantile`` — a distributed
  sketch whose driver-side result is ``2^bits`` doubles per column,
  independent of row count. Quantile (not equi-width) bucketing keeps
  the curve balanced under skew.
- Bucket assignment and bit interleaving are pure JVM column
  expressions (a fold over the broadcast boundary array + shifts/ORs)
  — whole-stage-codegen, no UDF, no shuffle.
- The write is one ``repartitionByRange`` on the z-value: a range
  exchange (sampled boundaries), producing ``n_files`` size-balanced,
  z-contiguous files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: Column, boundaries: list[float]) -> Column:
    """Index of ``col``'s quantile bucket: the count of boundaries
    <= value, evaluated as a BALANCED BINARY-SEARCH ``WHEN`` tree —
    O(bits) comparisons per row inside whole-stage codegen. (The
    previous array-fold form was O(2^bits) per row AND interpreted:
    higher-order functions bypass codegen, which dominated the rewrite
    cost at 255 boundaries — r11 profile: bits=8 bucket eval 2.5x the
    whole remaining pipeline.)"""
    d = col.cast("double")

    def rec(lo: int, hi: int) -> Column:
        # the answer (count of boundaries <= value) lies in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            d >= F.lit(float(boundaries[mid])), rec(mid + 1, hi)
        ).otherwise(rec(lo, mid))

    return rec(0, len(boundaries))


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position
    i * n_cols + j. Built as a chain of shift/OR expressions —
    codegen-friendly, depth bits × n_cols."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_values(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append a ``_zorder`` column: the Morton interleave of each
    column's ``2^bits``-quantile bucket index. Exposed separately from
    the write so callers can also use it for range-bucketed layouts."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE multi-column sketch pass: per-column approxQuantile calls
    # would each scan the full input (3 z-order columns = 3 scans of a
    # 100 TB table before the write even starts)
    all_boundaries = df.approxQuantile(list(cols), probs, 0.01)
    bucketed = df
    bucket_cols = []
    for c, boundaries in zip(cols, all_boundaries):
        bucket_cols.append(f"_zb_{c}")
        bucketed = bucketed.withColumn(
            f"_zb_{c}", _bucket_expr(F.col(c), boundaries)
        )
    z = _interleave([F.col(b) for b in bucket_cols], bits)
    return bucketed.withColumn("_zorder", z).drop(*bucket_cols)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    z-order curve of ``cols``. Files are z-contiguous ranges, so
    min/max footer stats on every z-ordered column are tight and a
    selective filter on ANY of them prunes most files."""
    zdf = zorder_values(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
