"""Streaming sessionization via Spark's native ``session_window``
(SURVEY §7 streaming extension; the streaming face of the batch
``ts_sessionize`` query).

The batch query numbers sessions with lag + cumulative sum; in streaming
the same gap-based grouping is the engine-native ``session_window`` — a
dynamic-gap window that merges events closer than the gap and closes a
session once the watermark passes its end. State is managed by the engine
(no custom stateful operator needed here — ``applyInPandasWithState``
stays reserved for logic session_window can't express, e.g. the
first-seen dedup in streaming/dedup.py).

Boundary note: ``session_window`` merges half-open [ts, ts+gap) intervals,
so an event at EXACTLY gap after the previous one starts a NEW session,
while the batch lag-rule (``gap > 30 min``) keeps it. Sub-second event
data never lands on the exact boundary; the batch/stream parity test
would catch it if it did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user gap-based sessions: row count, value sum, first/last event
    time per session. Update mode emits a session's current aggregate each
    time it grows; the final row per (user, window) is the closed session."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            "n_events",
            "total_value",
            "session_start",
            "session_end",
        )
    )
