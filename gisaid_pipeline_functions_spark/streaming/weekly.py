"""Structured Streaming variant of the weekly time-series (SURVEY §2.7,
§7 step 8 optional extension).

The reference is purely batch — its weekly bins are a batch tumbling
window. For a live feed (sequences/events arriving continuously) the same
W2 aggregation becomes a streaming tumbling window with a watermark for
late data; results upsert per (week, key) in update mode.

``window()`` buckets are epoch-aligned (1970-01-01 = Thursday), so the
Sunday anchor needs ``startTime='3 days'`` — Thursday + 3 days =
1970-01-04, the first Sunday (same correction the batch path makes
arithmetically, SURVEY §7 risk list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUNDAY_OFFSET = "3 days"  # epoch Thursday + 3 = Sunday anchor


def streaming_weekly_frequency(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "14 days",
) -> DataFrame:
    """W2 as a streaming tumbling window: one row per (week, key) that
    updates as events arrive; events later than the watermark are dropped
    (the batch reference silently drops out-of-range rows too)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "7 days", "7 days", SUNDAY_OFFSET).alias("week"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.to_date(F.col("week.start")).alias("week_start"),
            "key",
            "freq",
        )
    )


def run_stream_to_memory(
    spark, source_df_stream: DataFrame, table_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming aggregation to completion over a bounded backlog
    (Trigger.AvailableNow) and return the result as a DataFrame — used by
    tests to prove batch/stream parity. Session-window aggregations don't
    support complete mode — pass ``output_mode='update'`` for those."""
    q = (
        source_df_stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
