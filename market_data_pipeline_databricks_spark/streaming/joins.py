"""Stream-stream joins with event-time bounds.

Two watermarked streams joined on key + time-range condition: Spark
buffers each side in the state store and the watermark + range bound
let it evict rows that can no longer match — without them state grows
unboundedly. Inner joins emit matches as they form, so the
availableNow result over finite input equals the batch join
(oracle-checked in plans/stream_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_view_attribution(
    events: DataFrame, max_lag: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """Attribute each click to the same user's views in the preceding
    ``max_lag``: clicks ⋈ views ON user AND view.ts ∈ [click.ts − lag,
    click.ts]. The time bound is what makes join state evictable."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {max_lag}"))
        & (F.col("v_ts") <= F.col("c_ts")),
    ).select("c_user", "click_id", "view_id", "c_ts", "v_ts")


def click_view_attribution_outer(
    events: DataFrame, max_lag: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """LEFT OUTER variant: clicks with no view in the preceding
    ``max_lag`` ALSO emit, with NULL view columns — but only once the
    view-side watermark passes the click's latest possible match time
    (state expiry is what licenses the null: no future view can match).
    Matched pairs emit as they form, exactly like the inner join.

    The emission rule is therefore part of the contract: over finite
    availableNow input with final watermark W = max(ts) − delay,
    unmatched clicks emit iff c_ts < W; unmatched clicks in the
    trailing ``delay`` stay buffered and are absent. The batch oracle
    reproduces this with an anti-join + cutoff filter."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {max_lag}"))
        & (F.col("v_ts") <= F.col("c_ts")),
        "left_outer",
    ).select("c_user", "click_id", "view_id", "c_ts", "v_ts")
