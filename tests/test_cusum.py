"""CUSUM drift statistic: clamp invariants, numpy replay, and
partitioning invariance of the grouped-map recursion."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.functions.timeseries import cusum


def _series(spark):
    rows = [
        (1, i, v)
        for i, v in enumerate(
            [0.05, 0.04, -0.01, 0.06, -0.2, 0.01, 0.0, 0.03, 0.03, 0.03]
        )
    ] + [(2, i, 0.001 * ((-1) ** i)) for i in range(20)]
    return spark.createDataFrame(rows, "k long, t long, x double")


def test_clamps_and_numpy_replay(spark):
    out = cusum(_series(spark), ["k"], "t", "x", slack=0.02)
    rows = sorted(out.collect(), key=lambda r: (r.k, r.t))
    assert all(r.cusum_pos >= 0.0 and r.cusum_neg <= 0.0 for r in rows)
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        p = n = 0.0
        for r in rs:
            p = max(0.0, p + r.x - 0.02)
            n = min(0.0, n + r.x + 0.02)
            assert r.cusum_pos == p and r.cusum_neg == n, (k, r.t)


def test_partitioning_invariance(spark):
    d = _series(spark)
    a = sorted(map(tuple, cusum(d, ["k"], "t", "x").collect()))
    b = sorted(map(tuple, cusum(d.repartition(7), ["k"], "t", "x").collect()))
    assert a == b


def test_sustained_drift_alarms_noise_does_not(spark):
    """Key 1 ends with sustained +0.03 steps (above the 0.02 slack) so
    s+ grows; key 2 oscillates inside the band so both stats pin at
    the clamp."""
    out = cusum(_series(spark), ["k"], "t", "x", slack=0.02)
    last1 = out.filter("k = 1").orderBy(F.desc("t")).first()
    assert last1.cusum_pos > 0.0
    k2 = out.filter("k = 2").collect()
    assert all(abs(r.cusum_pos) < 1e-12 and abs(r.cusum_neg) < 1e-12 for r in k2)
