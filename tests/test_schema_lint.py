"""Registry-wide output-type lint (VERDICT r10 task 2).

Root cause of the r8-r10 driver hash-RED rows: the correctness driver's
value hash canonicalizes DecimalType through a trailing-zero-dropping
(float-like) form on one side only, so any final DecimalType column is a
hash hazard the moment a value ends in 0; timestamp_ntz encodes
differently from session-TZ timestamps the same way. The standing rule
(enforced here so it can never be reintroduced): every ORACLE-BACKED
registry query returns only driver-safe primitive types — decimals stay
internal to the plan and are cast to DOUBLE in the final projection on
both the Spark and DuckDB sides.
"""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.lint_schemas import _violations, scan

SF_DIR = "/root/testdata/sf0.001"


def test_planted_decimal_is_caught():
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DecimalType(27, 2)),
        ]
    )
    viols = []
    for f in schema.fields:
        viols.extend(_violations(f.dataType, f.name))
    assert viols == ["v: decimal(27,2) (driver-hash hazard)"]


def test_planted_ntz_and_nested_decimal_are_caught():
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("arr", T.ArrayType(T.DecimalType(12, 2))),
            T.StructField(
                "s",
                T.StructType([T.StructField("d", T.DecimalType(10, 0))]),
            ),
        ]
    )
    viols = []
    for f in schema.fields:
        viols.extend(_violations(f.dataType, f.name))
    assert viols == [
        "ts: timestamp_ntz (driver-hash hazard)",
        "arr[]: decimal(12,2) (driver-hash hazard)",
        "s.d: decimal(10,0) (driver-hash hazard)",
    ]


def test_approved_types_pass():
    for dt in (
        T.StringType(),
        T.LongType(),
        T.IntegerType(),
        T.DoubleType(),
        T.BooleanType(),
        T.DateType(),
        T.TimestampType(),
        T.ArrayType(T.DoubleType()),
        T.BinaryType(),
    ):
        assert _violations(dt, "c") == []


@pytest.mark.slow
def test_no_oracle_backed_query_emits_hazard_types(spark):
    """Full registry sweep at sf0.001: every oracle-backed query's final
    schema must contain only approved types (nested included). Slow —
    construction-writer queries do their real construction work — but
    this is THE gate that keeps the decimal defect from recurring."""
    bad = scan(spark, SF_DIR)
    assert not bad, f"driver-hash-hazard output types: {bad}"
