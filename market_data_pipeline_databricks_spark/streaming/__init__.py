"""Structured Streaming surface.

The reference reserves a ``checkpoints_dir`` (config.yaml:17) but never
built streaming; this package supplies the natural extension —
Auto-Loader-style CSV ingest into bronze, watermarked window
aggregations, and a custom stateful operator — designed for real
clusters (checkpointed, watermark-bounded state) while testable with
``availableNow`` triggers on local[n].
"""

from market_data_pipeline_databricks_spark.streaming.ingest import (
    read_price_csv_stream,
    run_available_now,
)
from market_data_pipeline_databricks_spark.streaming.windows import (
    daily_unique_users,
    nanos_conf_scope,
    read_event_stream,
    session_window_counts,
    sliding_window_value_sum,
    static_enrich_nation_counts,
    tumbling_daily_counts,
)

__all__ = [
    "daily_unique_users",
    "read_price_csv_stream",
    "run_available_now",
    "nanos_conf_scope",
    "read_event_stream",
    "tumbling_daily_counts",
    "sliding_window_value_sum",
    "session_window_counts",
    "static_enrich_nation_counts",
]
