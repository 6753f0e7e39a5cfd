"""Stream-stream interval join — the last Structured Streaming join
shape (weekly windows, session_window, stateful dedup, and stream-static
enrich are covered elsewhere in streaming/).

The classic attribution join: every 'click' matched to the same user's
'purchase' events within an interval. Spark keeps BOTH sides in the
state store and the pair of watermarks + the event-time range predicate
bound how long each side is retained — without them an inner
stream-stream join's state grows forever (the at-scale failure mode).
State eviction math (Spark docs, stream-stream joins): a click can stop
waiting once the purchase-side watermark passes click_ts + interval;
a purchase can drop once the click-side watermark passes purchase_ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_click_attribution(
    stream: DataFrame,
    interval: str = "30 minutes",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner stream-stream join: (user, click_ts) × (user, purchase_ts)
    with purchase_ts ∈ [click_ts, click_ts + interval]. Both sides are
    filtered projections of the SAME source stream (a self-join), each
    with its own watermark so the state store evicts: the join runs on
    the user-id equality key (state partitioned by user) plus the
    event-time range residual."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col(ts_col).alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""user_id = p_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {interval}"""
        ),
    )
    return joined.select(
        "user_id",
        "click_ts",
        "purchase_ts",
        F.round("click_value", 6).alias("click_value"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )
