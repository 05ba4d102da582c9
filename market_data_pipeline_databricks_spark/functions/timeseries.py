"""Grouped-map time-series features via ``applyInPandas``.

Window functions cover every frame-based feature (functions/market.py);
*recursive* features — EWMA, and anything of the form
``y[t] = f(y[t-1], x[t])`` — have no SQL window form. The Spark-native
answer is ``groupBy(key).applyInPandas``: each key's ordered series
arrives as one pandas DataFrame, the recursion runs vectorized inside
pandas/numpy, and the result keeps the engine's distributed shape (one
group per task, shuffle on the key only).

Scale: per-key series are bounded (a daily symbol series is O(10³)
rows/decade) so group memory is small; Arrow moves each group once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.1,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``e[0] = x[0]; e[t] = alpha*x[t] + (1-alpha)*e[t-1]``
    (pandas ``ewm(alpha, adjust=False)`` semantics; NULL values carry
    the previous EWMA forward)."""
    import pandas as pd  # noqa: F401 — imported for the worker closure

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def compute(pdf):
        pdf = pdf.sort_values(order_col)
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(compute, schema=out_schema)


def macd(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """MACD (moving-average convergence/divergence) per key: the three
    chained EWMA recursions of the classic indicator —
    ``macd = EMA_fast(x) − EMA_slow(x)``, ``signal = EMA_signal(macd)``,
    ``hist = macd − signal`` — with the standard span→alpha mapping
    ``alpha = 2/(span+1)`` and ``ewm(adjust=False)`` recursion
    (``e[0] = x[0]; e[t] = alpha*x[t] + (1-alpha)*e[t-1]``).

    One ``applyInPandas`` pass computes all three recursions, so the
    whole indicator costs a single shuffle on the key — the same
    distributed shape as ``ewma`` (three separate ``ewma`` calls plus
    joins would shuffle four times for the identical result).
    """
    import pandas as pd  # noqa: F401 — imported for the worker closure

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", ema_fast double, ema_slow double, macd double, signal double, hist double"

    a_fast, a_slow, a_sig = 2 / (fast + 1), 2 / (slow + 1), 2 / (signal + 1)

    def compute(pdf):
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col]
        pdf["ema_fast"] = x.ewm(alpha=a_fast, adjust=False).mean()
        pdf["ema_slow"] = x.ewm(alpha=a_slow, adjust=False).mean()
        pdf["macd"] = pdf["ema_fast"] - pdf["ema_slow"]
        pdf["signal"] = pdf["macd"].ewm(alpha=a_sig, adjust=False).mean()
        pdf["hist"] = pdf["macd"] - pdf["signal"]
        return pdf

    return df.groupBy(*key_cols).applyInPandas(compute, schema=out_schema)


def cusum(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    slack: float = 0.02,
    out_pos: str = "cusum_pos",
    out_neg: str = "cusum_neg",
) -> DataFrame:
    """Two-sided CUSUM drift statistic per key over an ordered series:

    ``s+[t] = max(0, s+[t-1] + x[t] - slack)`` (starts at 0)
    ``s-[t] = min(0, s-[t-1] + x[t] + slack)``

    The sequential change-point statistic (Page 1954) — accumulates
    sustained drift above/below the slack band while forgetting noise
    that mean-reverts inside it. A recursion with a max/min clamp, so
    no window frame expresses it — same grouped-map surface as
    :func:`ewma`/:func:`macd`, one shuffle on the key. The per-row
    Python loop is bounded by the per-key series length (days per
    instrument), not the corpus.
    """
    import numpy as np
    import pandas as pd  # noqa: F401 — imported for the worker closure

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_pos} double, {out_neg} double"

    def compute(pdf):
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=float)
        sp = np.empty(len(x))
        sn = np.empty(len(x))
        p = n = 0.0
        for i, v in enumerate(x):
            p = max(0.0, p + v - slack)
            n = min(0.0, n + v + slack)
            sp[i] = p
            sn[i] = n
        pdf[out_pos] = sp
        pdf[out_neg] = sn
        return pdf

    return df.groupBy(*key_cols).applyInPandas(compute, schema=out_schema)
