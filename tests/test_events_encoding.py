"""Regression: the testdata generator has shipped events.ts as
TIMESTAMP(NANOS) (rounds 1-2) and TIMESTAMP(MICROS, NTZ) (round 3+).
read_events must yield identical session-zone microsecond timestamps
for both footer encodings — the micros flavor previously went through
the raw-INT64 DIV 1000 path and produced 1970-era timestamps."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from market_data_pipeline_databricks_spark.sources.tables import (
    events_ts_unit,
    read_events,
)

_TS = [
    dt.datetime(2025, 3, 1, 9, 30, 0, 123456),
    dt.datetime(2025, 3, 1, 9, 30, 1, 999999),
    dt.datetime(2025, 12, 31, 23, 59, 59, 5),
]


def _write(dirpath, unit):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    dirpath.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, dirpath / "events.parquet", version="2.6")


def test_read_events_ns_and_us_equivalent(spark, tmp_path):
    _write(tmp_path / "ns", "ns")
    _write(tmp_path / "us", "us")
    assert events_ts_unit(str(tmp_path / "ns")) == "ns"
    assert events_ts_unit(str(tmp_path / "us")) == "us"

    got_ns = sorted(read_events(spark, str(tmp_path / "ns")).collect())
    got_us = sorted(read_events(spark, str(tmp_path / "us")).collect())
    assert got_ns == got_us
    assert [r.ts for r in got_us] == sorted(_TS)
    assert str(read_events(spark, str(tmp_path / "us")).schema["ts"].dataType) == (
        "TimestampType()"
    )
