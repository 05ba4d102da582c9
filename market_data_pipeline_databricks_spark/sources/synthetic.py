"""Deterministic synthetic OHLCV acquisition.

The reference declares a data-acquisition step (`scripts/
fetch_market_data.py` + requirements for requests/yfinance) but ships
it EMPTY — CSVs are assumed to appear in the raw dir. This module makes
the step real without network access: a seeded geometric-random-walk
generator that writes CSVs in the exact shape the bronze stage ingests
(`Date,Open,High,Low,Close,Volume`; FX symbols without a Volume
column, reproducing the schema-drift case). A real yfinance/stooq
fetcher drops into the same ``fetch(cfg)`` seam.
"""

from __future__ import annotations

import csv
import datetime as dt
import random
from pathlib import Path

from market_data_pipeline_databricks_spark.config import PipelineConfig

# FX instruments quote without volume (reference config.yaml:6-10 —
# EURUSD is the null-volume case).
FX_SYMBOLS = {"EURUSD", "GBPUSD", "USDJPY"}

_BASE_PRICE = {"SPY": 450.0, "GLD": 180.0, "EURUSD": 1.08, "USO": 70.0}


def generate_ohlcv_csv(
    path: Path,
    symbol: str,
    start: dt.date,
    end: dt.date,
    seed: int = 42,
) -> int:
    """Write one symbol's weekday OHLCV random walk; returns row count."""
    rng = random.Random(f"{symbol}:{seed}")
    px = _BASE_PRICE.get(symbol, 100.0)
    is_fx = symbol.upper() in FX_SYMBOLS
    daily_vol = 0.003 if is_fx else 0.012

    header = ["Date", "Open", "High", "Low", "Close"] + (
        [] if is_fx else ["Volume"]
    )
    n = 0
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        d = start
        while d <= end:
            if d.weekday() < 5:
                o = px
                c = px * (1 + rng.gauss(0.0002, daily_vol))
                h = max(o, c) * (1 + abs(rng.gauss(0, daily_vol / 2)))
                lo = min(o, c) * (1 - abs(rng.gauss(0, daily_vol / 2)))
                row = [d.isoformat(), f"{o:.6g}", f"{h:.6g}", f"{lo:.6g}", f"{c:.6g}"]
                if not is_fx:
                    row.append(str(int(rng.uniform(5e5, 5e6))))
                w.writerow(row)
                px = c
                n += 1
            d += dt.timedelta(days=1)
    return n


def fetch(cfg: PipelineConfig, seed: int = 42) -> dict[str, int]:
    """Populate ``cfg.raw_dir`` with one CSV per configured symbol over
    [start_date, end_date] (defaults: trailing year). The acquisition
    seam a network-backed fetcher would implement."""
    raw = Path(cfg.raw_dir)
    raw.mkdir(parents=True, exist_ok=True)
    end = (
        dt.date.fromisoformat(cfg.end_date)
        if cfg.end_date
        else dt.date(2025, 12, 31)
    )
    start = (
        dt.date.fromisoformat(cfg.start_date)
        if cfg.start_date
        else end - dt.timedelta(days=365)
    )
    return {
        sym: generate_ohlcv_csv(raw / f"{sym}.csv", sym, start, end, seed)
        for sym in cfg.symbols
    }
