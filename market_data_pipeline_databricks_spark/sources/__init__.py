"""Sources and sinks: CSV price ingestion, parquet table IO, upsert writer."""

from market_data_pipeline_databricks_spark.sources.csv_prices import read_prices_csv
from market_data_pipeline_databricks_spark.sources.tables import (
    read_table,
    register_testdata,
    testdata_table,
)
from market_data_pipeline_databricks_spark.sources.writers import (
    append_table,
    overwrite_table,
    upsert_by_key,
)

__all__ = [
    "read_prices_csv",
    "read_table",
    "register_testdata",
    "testdata_table",
    "append_table",
    "overwrite_table",
    "upsert_by_key",
]
