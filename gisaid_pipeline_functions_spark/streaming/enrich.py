"""Stream-static enrichment (the remaining Structured Streaming join
shape beside the windowed aggs, sessions, and stateful dedup).

A live event stream joined to a slow-changing dimension is the classic
streaming enrich: Spark plans a stream-static inner join STATELESSLY —
the static side is read (and with an explicit hint, broadcast) per
micro-batch, no state store involved — so it composes freely with a
downstream watermark + windowed aggregation. At cluster scale the
static side is a dimension table; the broadcast hint keeps the
per-batch join shuffle-free exactly like the batch J2/J4 dimension
joins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .weekly import SUNDAY_OFFSET


def streaming_weekly_by_dim(
    stream: DataFrame,
    dim: DataFrame,
    join_col: str,
    dim_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "14 days",
) -> DataFrame:
    """Enrich the stream with a broadcast static dimension, then run the
    Sunday-anchored weekly aggregation per dimension value: one row per
    (week, dim) carrying event count and 6dp-rounded value total.
    Inner join semantics: events with no dimension row are dropped
    (exactly the batch J2 behavior)."""
    enriched = stream.join(F.broadcast(dim), join_col)
    return (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "7 days", "7 days", SUNDAY_OFFSET).alias("week"),
            F.col(dim_col),
        )
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            F.to_date(F.col("week.start")).alias("week_start"),
            F.col(dim_col),
            "freq",
            "total_value",
        )
    )
