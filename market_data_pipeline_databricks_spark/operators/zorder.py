"""Z-order (Morton) clustering for multi-column scan pruning.

A lakehouse table queried by a conjunctive box predicate on two keys
(`a BETWEEN .. AND b BETWEEN ..`) reads almost every file when the
layout is insertion- or single-key-ordered: sorting by `a` clusters
`a` but scatters `b`. Interleaving the bits of both keys (the Morton /
Z-curve) and range-partitioning + sorting on that single value gives
every file a tight min/max envelope on BOTH columns, so footer-stats
skipping (parquet row groups locally; Delta/Iceberg file stats at
cluster scale) prunes the scan to the files whose envelope intersects
the box — the standard OPTIMIZE ZORDER BY layout, built here from
plain DataFrame ops.

No reference analog; 100-TB extension (the reference's partitioned
DDL covers single-key pruning only). All arithmetic is JVM-side
integer bit twiddling — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread16(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` to the even bit positions of a
    32-bit value (classic mask-shift bit dilation, 4 rounds)."""
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(
    a: Column, a_min: Column, a_max: Column, b: Column, b_min: Column, b_max: Column
) -> Column:
    """32-bit Morton code of two integer keys, each quantized to 16
    bits over its [min, max] range: ``floor((x − min)·2¹⁶ / span)``.
    The (x − min)·2¹⁶ product runs in decimal(20,0)·2¹⁶ (≤ 25 digits),
    so it cannot wrap even for full-long key spans — in LongType
    arithmetic spans ≥ 2⁴⁷ silently overflowed (non-ANSI wraparound)
    and scrambled the layout. The decimal quotient keeps ≥ 6
    fractional digits before the floor, so a rare last-digit rounding
    flip can still move a row one z-bucket — the code orders the
    LAYOUT only, never a query result, so that is a (negligible)
    clustering perturbation, not a correctness issue."""
    # subtract in decimal as well: a full-int64 key range would
    # overflow even the long span/offset subtraction
    dec = lambda c: c.cast("long").cast("decimal(20,0)")
    a_span = dec(a_max) - dec(a_min) + F.lit(1)
    b_span = dec(b_max) - dec(b_min) + F.lit(1)
    da = dec(a) - dec(a_min)
    db = dec(b) - dec(b_min)
    qa = F.floor((da * F.lit(65536)) / a_span)
    qb = F.floor((db * F.lit(65536)) / b_span)
    # clamp the max element into the top bucket
    qa = F.least(qa, F.lit(65535)).cast("long")
    qb = F.least(qb, F.lit(65535)).cast("long")
    return _spread16(qa).bitwiseOR(F.shiftleft(_spread16(qb), 1)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered by the Morton code of
    (col_a, col_b): range-partition into ``n_files`` z-ranges, sort
    within each, drop the helper column. One extra pass (the range
    sampler) over a projection — the standard OPTIMIZE cost."""
    bounds = df.agg(
        F.min(col_a).alias("a_min"),
        F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"),
        F.max(col_b).alias("b_max"),
    )
    z = zorder_value(
        F.col(col_a),
        F.col("a_min"),
        F.col("a_max"),
        F.col(col_b),
        F.col("b_min"),
        F.col("b_max"),
    )
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z__", z)
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__", "a_min", "a_max", "b_min", "b_max")
        .write.mode("overwrite")
        .parquet(path)
    )
