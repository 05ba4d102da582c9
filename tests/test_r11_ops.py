"""Round-11 additions: salted windowed rank + layout-governed z-order.

`scale_salted_window_rank` is the per-key generalization of the
two-pass global rank (range partition → local rank per (pid, key) →
per-key cumulative offsets): a ROW_NUMBER over PARTITION BY
l_returnflag (3 keys) would land ~1/3 of the table in each window task.
`scale_layout_zorder_pruning` drives sources/layout.py's
quantile-bucketed Morton layout as a governed rewrite that must be
row-identical to its input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_salted_window_rank_equals_mono_partition_window(spark):
    out = entrymod.queries()["scale_salted_window_rank"](spark, SF)
    rows = out.collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    truth = {
        (r.l_orderkey, r.l_linenumber): r.rk
        for r in li.withColumn("rk", F.row_number().over(w)).collect()
    }
    got = {(r.l_orderkey, r.l_linenumber): r.key_rank for r in rows}
    assert got == truth


def test_salted_window_rank_is_dense_per_key(spark):
    rows = entrymod.queries()["scale_salted_window_rank"](spark, SF).collect()
    by_key: dict[str, list[int]] = {}
    for r in rows:
        by_key.setdefault(r.l_returnflag, []).append(r.key_rank)
    assert len(by_key) == 3
    for key, ranks in by_key.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), key


def test_salted_window_rank_table_window_is_distributed(spark):
    """The table-scaled window must be keyed on (pid, key) — same
    contract as the global two-pass rank (the per-(key,pid) offsets
    window over |keys|x|parts| rows is allowed to be key-only)."""
    import re

    plan = (
        entrymod.queries()["scale_salted_window_rank"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"row_number\(\) windowspecdefinition\(pid#", plan), (
        "table-scaled window is not keyed on the range partition id"
    )


def test_layout_zorder_pruning_runs_and_matches_plain_filter(spark):
    out = entrymod.queries()["scale_layout_zorder_pruning"](spark, SF)
    rows = out.collect()
    assert len(rows) == 1
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    o_a = lo_o + (hi_o - lo_o) // 2
    o_b = o_a + (hi_o - lo_o) // 8
    p_a = lo_p + (hi_p - lo_p) // 2
    p_b = p_a + (hi_p - lo_p) // 8
    n = li.filter(
        F.col("l_orderkey").between(o_a, o_b)
        & F.col("l_partkey").between(p_a, p_b)
    ).count()
    assert rows[0].n_rows == n
    assert isinstance(rows[0].sum_price, float)


def test_layout_zorder_mutation_is_caught(spark, monkeypatch):
    """Sabotage: the governed rewrite silently drops rows — the
    in-query checked_lazy multiset diff must raise, not return."""
    from market_data_pipeline_databricks_spark.plans import scale_ops
    from market_data_pipeline_databricks_spark.plans._eager import (
        ConstructionMismatchError,
    )
    from market_data_pipeline_databricks_spark.sources import layout

    real = layout.zorder_write

    def lossy(df, path, cols, n_files=16, bits=8):
        real(df.filter(F.col("l_orderkey") % 7 != 0), path, cols, n_files, bits)

    monkeypatch.setattr(
        "market_data_pipeline_databricks_spark.sources.layout.zorder_write",
        lossy,
    )
    with pytest.raises(ConstructionMismatchError):
        scale_ops.scale_layout_zorder_pruning(spark, SF)
