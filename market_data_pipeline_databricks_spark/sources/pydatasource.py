"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic market-tick source.

The reference ingests vendor CSV drops; at scale the same pipeline
often reads from an internal service or generator instead of files.
Spark 4's Python Data Source API is the sanctioned way to mount such a
source as a first-class ``spark.read.format(...)`` — schema, options,
and partition-parallel reads all declared, no RDD glue. This module
exercises that API end to end with a generator whose output is a pure
function of (symbol, day, seq), so tests can assert exact rows and
partitioning invariance.

Scale shape: one ``InputPartition`` per symbol — the natural unit a
market-data reader parallelizes over (executors fetch symbols
independently; no driver-side row materialization). Row synthesis is
hash-arithmetic per row, no RNG state shared across partitions.

Usage::

    from market_data_pipeline_databricks_spark.sources.pydatasource import (
        SyntheticTicksDataSource,
    )
    spark.dataSource.register(SyntheticTicksDataSource)
    df = (spark.read.format("synthetic_ticks")
          .option("symbols", "AAPL,MSFT")
          .option("days", "3")
          .option("ticks_per_day", "10")
          .load())
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EPOCH = dt.date(2025, 1, 1)


def _u(symbol: str, day: int, seq: int, salt: str) -> float:
    """Deterministic uniform in [0, 1) from the row coordinates —
    the same content-addressed md5 discipline as operators/sampling."""
    h = hashlib.md5(f"{symbol}:{day}:{seq}:{salt}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def day_rows(symbol: str, day: int, ticks_per_day: int):
    """Pure generator of one day's (symbol, day, seq, price, volume)
    tuples. Price is a deterministic walk around a per-symbol base;
    volume a deterministic draw — both reproducible on any executor
    AND in any engine: every step is exact IEEE arithmetic on 52-bit
    uniforms and the only rounding is floor-truncation (python
    ``round`` would banker's-round where SQL ROUND rounds half-up, so
    the oracle twin regenerates these exact values with FLOOR)."""
    import math

    base = 50.0 + (int(hashlib.md5(symbol.encode()).hexdigest()[:6], 16) % 1000)
    for seq in range(ticks_per_day):
        drift = (_u(symbol, day, seq, "p") - 0.5) * 2.0
        price = math.floor((base + day * 0.25 + drift) * 1e4) / 1e4
        volume = 100 + math.floor(_u(symbol, day, seq, "v") * 900)
        yield (
            symbol,
            _EPOCH + dt.timedelta(days=day),
            seq,
            price,
            volume,
        )


def tick_rows(symbol: str, days: int, ticks_per_day: int):
    """All days of :func:`day_rows` for one symbol."""
    for day in range(days):
        yield from day_rows(symbol, day, ticks_per_day)


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class SyntheticTicksReader(DataSourceReader):
    def __init__(self, options):
        self.symbols = [
            s.strip()
            for s in options.get("symbols", "AAPL,MSFT,GOOG").split(",")
            if s.strip()
        ]
        self.days = int(options.get("days", "5"))
        self.ticks_per_day = int(options.get("ticks_per_day", "100"))

    def partitions(self):
        return [_SymbolPartition(s) for s in self.symbols]

    def read(self, partition):
        yield from tick_rows(
            partition.symbol, self.days, self.ticks_per_day
        )


class SyntheticTicksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return (
            "symbol string, day date, seq int, price double, volume long"
        )

    def reader(self, schema):
        return SyntheticTicksReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticTicksStreamReader(self.options)


class SyntheticTicksStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader (``SimpleDataSourceStreamReader`` contract):
    offset = {"day": k}; a batch emits every not-yet-read trading day
    (Trigger.AvailableNow processes exactly the batch a simple reader
    had prefetched when the query started, so per-day dribbling would
    silently drop the tail), then reports no-new-data (offset stops
    advancing) so the query terminates. State lives in the offset
    alone — restart-safe."""

    def __init__(self, options):
        self.symbols = [
            s.strip()
            for s in options.get("symbols", "AAPL,MSFT,GOOG").split(",")
            if s.strip()
        ]
        self.days = int(options.get("days", "5"))
        self.ticks_per_day = int(options.get("ticks_per_day", "100"))

    def initialOffset(self):
        return {"day": 0}

    def read(self, start):
        day = start["day"]
        if day >= self.days:
            return iter([]), start
        rows = [
            t
            for d in range(day, self.days)
            for symbol in self.symbols
            for t in day_rows(symbol, d, self.ticks_per_day)
        ]
        return iter(rows), {"day": self.days}

    def readBetweenOffsets(self, start, end):
        rows, _ = self.read(start)
        return rows

    def commit(self, end):
        pass
