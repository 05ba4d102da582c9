"""Market/time-series feature functions as pure Column expressions.

Each takes a per-key ordered :class:`~pyspark.sql.Window` (the caller
owns partitioning — one shuffle on the key serves every feature) and
returns a Column. All are single-pass window aggregates: at 100 TB the
cost is one sort per key-partition, shared across features.

The reference's own features (return_1d, vol_20d, avg_volume_20d —
notebooks/gold/03_aggregate_gold.py:48,63-73) are the first three;
the rest are the natural extension surface built the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def simple_return(close: Column, w: WindowSpec, periods: int = 1) -> Column:
    """close / LAG(close, periods) - 1 (reference :48)."""
    return close / F.lag(close, periods).over(w) - 1


def log_return(close: Column, w: WindowSpec, periods: int = 1) -> Column:
    """ln(close / LAG(close, periods))."""
    return F.ln(close / F.lag(close, periods).over(w))


def momentum(close: Column, w: WindowSpec, periods: int = 20) -> Column:
    """Price momentum: return over ``periods`` rows."""
    return simple_return(close, w, periods)


def _frame(w: WindowSpec, n: int) -> WindowSpec:
    return w.rowsBetween(-(n - 1), 0)


def rolling_vol(returns: Column, w: WindowSpec, n: int = 20) -> Column:
    """Rolling sample stddev of returns, n-row frame (reference :63-67).
    NULL until ≥2 non-null inputs (STDDEV_SAMP semantics)."""
    return F.stddev_samp(returns).over(_frame(w, n))


def rolling_avg(col: Column, w: WindowSpec, n: int = 20) -> Column:
    """Rolling mean, n-row frame (reference :69-73); NULLs ignored."""
    return F.avg(col).over(_frame(w, n))


def rolling_vwap(
    price: Column, volume: Column, w: WindowSpec, n: int = 20
) -> Column:
    """Volume-weighted average price over an n-row frame.

    Decimal sums: order-independent across engines/partitions, so the
    result is deterministic under any task scheduling.
    """
    f = _frame(w, n)
    # Sum exactly in decimal, divide in double: decimal÷decimal result
    # scale is engine-specific, IEEE double division is not.
    pv = F.sum((price * volume).cast("decimal(27,6)")).over(f).cast("double")
    v = F.sum(volume.cast("decimal(27,6)")).over(f).cast("double")
    return pv / v


def drawdown(close: Column, w: WindowSpec) -> Column:
    """Drawdown from the running peak: close / MAX(close) so-far - 1
    (≤ 0; 0 at new highs)."""
    peak = F.max(close).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return close / peak - 1


def zscore(col: Column, w: WindowSpec, n: int = 20) -> Column:
    """(x - rolling mean) / rolling stddev over an n-row frame; NULL
    while the frame has <2 rows (stddev undefined) AND for a constant
    frame (stddev 0 — a halted instrument; ANSI mode would otherwise
    raise DIVIDE_BY_ZERO instead of flagging nothing)."""
    f = _frame(w, n)
    sd = F.stddev_samp(col).over(f)
    return F.when(sd > 0, (col - F.avg(col).over(f)) / sd)


def true_range(high: Column, low: Column, prev_close: Column) -> Column:
    """Wilder's true range: the day's span extended to cover any gap
    from the prior close — GREATEST(high−low, |high−prev_close|,
    |low−prev_close|). First row (no prior close) falls back to
    high−low."""
    return F.coalesce(
        F.greatest(
            high - low, F.abs(high - prev_close), F.abs(low - prev_close)
        ),
        high - low,
    )


def atr(high: Column, low: Column, close: Column, w: WindowSpec, n: int = 14) -> Column:
    """Average true range over an n-row frame (simple-mean variant; the
    classic Wilder smoothing is a recursion — use functions.timeseries
    ewma with alpha=1/n for that form)."""
    prev_close = F.lag(close).over(w)
    return F.avg(true_range(high, low, prev_close)).over(_frame(w, n))


def parkinson_vol(high: Column, low: Column, w: WindowSpec, n: int = 20) -> Column:
    """Parkinson range volatility: sqrt(mean(ln(high/low)²) / (4·ln 2))
    over an n-row frame — a high/low-based estimator ~5x more efficient
    than close-to-close stddev on the same sample. NULL until the frame
    has a row; 0 for flat bars (high == low)."""
    sq = F.pow(F.log(high / low), F.lit(2))
    return F.sqrt(F.avg(sq).over(_frame(w, n)) / (4 * 0.6931471805599453))
