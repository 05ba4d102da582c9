"""Single registry of named queries + oracle twins.

``__spark_entry__`` and ``bench.py`` both read from here; extension
modules (text_ops, vector_ops, analyst) register by being imported.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_data_pipeline_databricks_spark.plans import relational

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(relational.QUERIES)
    for mod in _extension_modules():
        out.update(mod.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    for mod in _extension_modules():
        out.update(mod.ORACLE_SQL)
    return out


def _extension_modules():
    mods = []
    for name in (
        "relational_ext",
        "breadth_ops",
        "asof_ops",
        "text_ops",
        "vector_ops",
        "analyst",
        "stream_ops",
        "feature_ops",
        "scale_ops",
    ):
        try:
            mods.append(
                __import__(
                    f"market_data_pipeline_databricks_spark.plans.{name}",
                    fromlist=[name],
                )
            )
        except ImportError:
            continue
    return mods
