"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 and compares:
- row count,
- sorted column names,
- an order-insensitive value multiset (exact equality, which is
  *stricter* than any reasonable hash — if this passes, the driver's
  hash passes).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from market_data_pipeline_databricks_spark.session import get_spark
from market_data_pipeline_databricks_spark.sources.tables import TESTDATA_TABLES
from tools.lint_schemas import _violations as _schema_violations


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double: bitwise-equal floats normalize identically
        return repr(v)
    return str(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            otypes = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        problems = []
        # The driver's value hash is type-encoding sensitive where this
        # checker's string-normalize is not: DuckDB widens integer SUM to
        # HUGEINT (int128) which Spark cannot produce — that exact class
        # caused the only r4 driver failures. Flag it as a hard failure.
        wide = [
            f"{c}:{t}"
            for c, t, *_ in otypes
            if "HUGEINT" in t.upper() or "UBIGINT" in t.upper()
        ]
        if wide:
            problems.append(
                f"oracle emits 128-bit/unsigned ints (cast to BIGINT): {wide}"
            )
        # Same class of blind spot, proven root cause of the r8-r10
        # hash-RED rows (VERDICT r10): the driver hash canonicalizes
        # DecimalType through a trailing-zero-dropping float-like form
        # on one side only, and timestamp_ntz encodes differently from
        # session-TZ timestamps. _norm's str() maps Decimal('1.00') and
        # DuckDB's 1.00 to the same string, so the multiset check can
        # never see it. Hard-fail the SCHEMA instead (recursively —
        # array<decimal> hides the same hazard): final outputs must
        # cast decimals to DOUBLE and ntz timestamps to DATE/TIMESTAMP
        # on BOTH sides (keep decimal arithmetic internal).
        hazard = []
        for f in sdf.schema.fields:
            hazard.extend(_schema_violations(f.dataType, f.name))
        if hazard:
            problems.append(
                f"spark schema emits driver-hash-hazard types "
                f"(cast decimals to DOUBLE, ntz to DATE): {hazard}"
            )
        odec = [
            f"{c}:{t}"
            for c, t, *_ in otypes
            if "DECIMAL" in t.upper()
        ]
        if odec:
            problems.append(
                f"oracle emits DECIMAL columns (wrap in CAST(.. AS "
                f"DOUBLE) to mirror the Spark side): {odec}"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            ms, mo = _multiset(srows, scols), _multiset(orows, ocols)
            if ms != mo:
                diff_s = list((ms - mo).items())[:3]
                diff_o = list((mo - ms).items())[:3]
                problems.append(f"values spark-only={diff_s} duckdb-only={diff_o}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
