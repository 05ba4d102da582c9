"""market_data_pipeline_databricks_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``Akaran19/market-data-pipeline-databricks`` (medallion OHLCV ETL:
bronze ingest → silver validation → gold rolling features → data-quality
audit), built Spark-first on the open-source PySpark DataFrame/SQL API:

- every pipeline stage is a pure ``DataFrame -> DataFrame`` function
  (testable without a metastore), with thin writers for materialization;
- all rule logic is Catalyst-optimizable Column expressions — no Python
  row UDFs in any core path;
- partitioning, broadcast strategy and AQE settings are chosen for a
  1000-executor / 100 TB deployment even though tests run on local[32].

Beyond reference parity, the package ships large-scale training-data
operators (deduplication, similarity search, text analysis, multimodal
column plumbing) under ``operators/`` — see SURVEY.md §7.4.
"""

from market_data_pipeline_databricks_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
