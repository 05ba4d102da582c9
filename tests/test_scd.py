"""SCD Type 2: versioning invariants under a mixed update batch —
changed, unchanged, brand-new, null-transitions, and absent keys."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _dim(spark):
    rows = [
        # key, attr_a, attr_b, valid_from, valid_to, is_current
        (1, "acme", 10.0, dt.date(2025, 1, 1), dt.date(2025, 6, 1), False),
        (1, "acme", 12.5, dt.date(2025, 6, 1), None, True),
        (2, "globex", 7.0, dt.date(2025, 2, 1), None, True),
        (3, "initech", None, dt.date(2025, 3, 1), None, True),
        (4, "umbra", 1.0, dt.date(2025, 4, 1), None, True),
    ]
    return spark.createDataFrame(
        rows,
        "k int, name string, score double, valid_from date, "
        "valid_to date, is_current boolean",
    )


def _updates(spark):
    eff = dt.date(2025, 8, 1)
    rows = [
        (1, "acme", 12.5, eff),       # unchanged -> ignored
        (2, "globex", 9.0, eff),      # changed  -> close + reopen
        (3, "initech", 3.0, eff),     # NULL -> value counts as change
        (5, "hooli", 2.0, eff),       # brand-new -> open row
        # key 4 absent -> untouched
    ]
    return spark.createDataFrame(
        rows, "k int, name string, score double, effective_date date"
    )


def test_scd2_apply_full_matrix(spark):
    from market_data_pipeline_databricks_spark.operators.scd import scd2_apply

    out = scd2_apply(
        _dim(spark), _updates(spark), ["k"], ["name", "score"]
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)

    # exactly one current row per key, including the new key
    for k, rows in by_key.items():
        assert sum(1 for r in rows if r.is_current) == 1, k

    # unchanged key 1: history row + same open row, no new version
    k1 = sorted(by_key[1], key=lambda r: r.valid_from)
    assert len(k1) == 2
    assert k1[1].score == 12.5 and k1[1].is_current and k1[1].valid_to is None

    # changed key 2: old row closed at effective date, new row open
    k2 = sorted(by_key[2], key=lambda r: r.valid_from)
    assert len(k2) == 2
    assert not k2[0].is_current and k2[0].valid_to == dt.date(2025, 8, 1)
    assert k2[0].score == 7.0
    assert k2[1].is_current and k2[1].score == 9.0
    assert k2[1].valid_from == dt.date(2025, 8, 1) and k2[1].valid_to is None

    # NULL -> value is a change (null-safe comparison)
    k3 = sorted(by_key[3], key=lambda r: r.valid_from)
    assert len(k3) == 2 and k3[1].score == 3.0

    # absent key 4 untouched
    assert len(by_key[4]) == 1 and by_key[4][0].is_current

    # new key 5 inserted open
    k5 = by_key[5]
    assert len(k5) == 1 and k5[0].is_current
    assert k5[0].valid_from == dt.date(2025, 8, 1)

    # interval integrity: per key, versions tile without overlap
    for k, rows in by_key.items():
        rows = sorted(rows, key=lambda r: r.valid_from)
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from, k


def test_scd2_apply_is_idempotent_for_same_batch(spark):
    from market_data_pipeline_databricks_spark.operators.scd import scd2_apply

    once = scd2_apply(_dim(spark), _updates(spark), ["k"], ["name", "score"])
    twice = scd2_apply(once, _updates(spark), ["k"], ["name", "score"])
    key = lambda t: tuple(str(x) for x in t)  # None-safe total order
    a = sorted(map(tuple, once.collect()), key=key)
    b = sorted(map(tuple, twice.collect()), key=key)
    assert a == b  # re-applying the same updates changes nothing


def test_scd2_plan_passes_history_through_without_join(spark):
    from market_data_pipeline_databricks_spark.operators.scd import scd2_apply

    out = scd2_apply(_dim(spark), _updates(spark), ["k"], ["name", "score"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the history branch must not participate in the join: exactly one
    # Join node in the whole plan (updates x current)
    assert plan.count("Join") == 1, plan


def test_scd2_point_in_time_join(spark):
    """Facts pick the version valid at their own ts: before the first
    version -> NULL (left join), inside a closed interval -> that
    version, on the boundary -> the NEW version ([from, to) semantics),
    after the last close -> the open version; no fan-out."""
    from market_data_pipeline_databricks_spark.operators.scd import (
        scd2_point_in_time_join,
    )

    dim = _dim(spark)  # key 1 has two versions split at 2025-06-01
    facts = spark.createDataFrame(
        [
            (1, dt.date(2024, 12, 1), "before_history"),
            (1, dt.date(2025, 3, 1), "first_version"),
            (1, dt.date(2025, 6, 1), "boundary_goes_to_new"),
            (1, dt.date(2025, 12, 1), "open_version"),
            (2, dt.date(2025, 7, 1), "other_key"),
        ],
        "k int, ts date, label string",
    )
    out = {r.label: r for r in scd2_point_in_time_join(
        facts, dim, ["k"], "ts"
    ).collect()}
    assert len(out) == 5  # one row per fact: tiling prevents fan-out
    assert out["before_history"].score is None
    assert out["first_version"].score == 10.0
    assert out["boundary_goes_to_new"].score == 12.5
    assert out["open_version"].score == 12.5
    assert out["other_key"].score == 7.0


def test_scd2_apply_null_effective_date_fails_fast(spark):
    """An update row with a NULL effective date is INVALID INPUT, not
    'key absent from batch': with the old effective-IS-NOT-NULL
    presence probe its attribute changes were silently dropped
    (round-4 advice). The presence marker classifies it as an update,
    and the lazy raise_error surfaces it at execution."""
    import pytest

    from market_data_pipeline_databricks_spark.operators.scd import scd2_apply

    bad = spark.createDataFrame(
        [(2, "globex-changed", 99.0, None)],
        "k int, name string, score double, effective_date date",
    )
    out = scd2_apply(_dim(spark), bad, ["k"], ["name", "score"])
    with pytest.raises(Exception, match="NULL effective_date"):
        out.collect()
