"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's gold
feature pipeline re-expressed over the testdata) at sf0.001;
``queries()`` exposes one named DataFrame builder per implemented
operator from SURVEY.md §2 (plus the training-data extensions);
``oracle_sql()`` provides DuckDB twins for the hash-compare gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_data_pipeline_databricks_spark.plans import registry, relational


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.window_supplier_daily_gold(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect twins for every SQL-expressible query above."""
    return registry.all_oracle_sql()
