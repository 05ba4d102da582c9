"""The reference's analyst SQL corpus, VERBATIM, against a DuckDB
oracle (round-6 verdict task 6).

Every statement in the reference's ``sql/example_queries.sql`` (MIT
licensed; the QUALIFY dialect-acceptance precedent is
test_sqlcompat.test_verbatim_reference_merge_into) is executed
unmodified through :mod:`sqlcompat` on Spark AND natively on DuckDB —
which supports QUALIFY — over the SAME synthetic
``gold_market_features_daily`` table, then compared as value multisets.
This pins the whole dialect surface the reference's analysts use:
QUALIFY + window, scalar MAX-date subqueries, self-join over a date
INTERVAL range with HAVING over an aggregate, date literals, ORDER BY
expression, LIMIT.
"""

from __future__ import annotations

import datetime as dt
import math
from pathlib import Path

import duckdb
import pytest

from market_data_pipeline_databricks_spark import sqlcompat

REF_SQL = Path("/root/reference/sql/example_queries.sql")
# The corpus is executed VERBATIM against live Spark and DuckDB
# sessions, and the reference checkout is untrusted content — pin the
# exact bytes (round-7 advice) so a modified checkout fails loudly
# instead of running arbitrary SQL. Reviewed at this hash: 14
# statements, pure SELECTs over gold_market_features_daily, no DDL /
# COPY / file access.
REF_SQL_SHA256 = "db3f9f286eff097375b89d88666c89c8c2f4dba2b52e5b44591670d467f32fd2"

SYMBOLS = ["SPY", "AAPL", "EURUSD", "BTC", "TLT", "GLD"]
START = dt.date(2025, 9, 1)
N_DAYS = 120  # spans the corpus's DATE '2025-12-23' literal


def _rows():
    rows = []
    for si, sym in enumerate(SYMBOLS):
        prev_close = None
        for d in range(N_DAYS):
            date = START + dt.timedelta(days=d)
            close = 100.0 + 10 * si + 5 * math.sin(0.37 * d + si)
            ret = (
                None
                if prev_close is None
                else (close - prev_close) / prev_close
            )
            vol = None if d < 2 else abs(math.sin(0.11 * d + 2 * si)) * 0.05
            avgvol = (
                None
                if sym == "EURUSD"  # FX carries no volume (pipeline parity)
                else 1e6 + 1e4 * d + 1e5 * si
            )
            rows.append((sym, date, close, ret, vol, avgvol))
            prev_close = close
    return rows


COLS = ["symbol", "date", "close", "return_1d", "vol_20d", "avg_volume_20d"]


def _statements():
    import hashlib

    data = REF_SQL.read_bytes()
    digest = hashlib.sha256(data).hexdigest()
    if digest != REF_SQL_SHA256:
        raise AssertionError(
            "reference sql/example_queries.sql changed (sha256 "
            f"{digest}); review the new content before executing it "
            "verbatim, then update REF_SQL_SHA256"
        )
    text = data.decode()
    stmts = []
    for raw in text.split(";"):
        # strip comment-only / empty fragments
        lines = [
            ln
            for ln in raw.splitlines()
            if ln.strip() and not ln.strip().startswith("--")
        ]
        if lines:
            stmts.append("\n".join(lines))
    return stmts


@pytest.fixture(scope="module")
def engines(spark):
    df = spark.createDataFrame(
        _rows(),
        "symbol string, date date, close double, return_1d double, "
        "vol_20d double, avg_volume_20d double",
    )
    df.createOrReplaceTempView("gold_market_features_daily")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE gold_market_features_daily("
        "symbol VARCHAR, date DATE, close DOUBLE, return_1d DOUBLE, "
        "vol_20d DOUBLE, avg_volume_20d DOUBLE)"
    )
    con.executemany(
        "INSERT INTO gold_market_features_daily VALUES (?,?,?,?,?,?)",
        _rows(),
    )
    return spark, con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # both engines aggregate the same doubles but may associate
        # sums differently — compare at 9 significant digits
        return f"{v:.9g}"
    return str(v)


def _key(row, names, order):
    return tuple(_norm(row[names[i]] if hasattr(row, "keys") else row[i]) for i in order)


def test_reference_corpus_has_expected_size():
    # 5 statements in the first block + 9 in the second
    assert len(_statements()) == 14


@pytest.mark.parametrize("idx", range(14))
def test_reference_statement_verbatim(engines, idx):
    spark, con = engines
    stmt = _statements()[idx]
    sdf = sqlcompat.sql(spark, stmt)
    scols = sdf.columns
    srows = sdf.collect()
    dres = con.execute(stmt)
    dcols = [c[0] for c in dres.description]
    drows = dres.fetchall()
    assert [c.lower() for c in scols] == [c.lower() for c in dcols], (
        scols,
        dcols,
    )
    order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    from collections import Counter

    sm = Counter(tuple(_norm(r[i]) for i in order) for r in srows)
    dm = Counter(tuple(_norm(r[i]) for i in order) for r in drows)
    assert sm == dm, (
        f"statement {idx} multiset mismatch; spark-only="
        f"{list((sm - dm).items())[:3]} duck-only={list((dm - sm).items())[:3]}"
    )
