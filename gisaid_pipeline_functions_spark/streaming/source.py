"""Canonical streaming source for the events table.

The batch side funnels every read through ``sources.tables.load_table``,
which guarantees ONE timestamp semantics: forced-UTC session, canonical
``TIMESTAMP`` type, regardless of how the parquet stored the column
(tz-aware, tz-naive → TIMESTAMP_NTZ in Spark ≥4, or ns-precision long).
A streaming read that bypasses that boundary re-introduces the type split
— ``withWatermark``/``window()`` over NTZ silently bucket differently
than the batch ``sunday_week_start`` path, and ``session_window`` parity
breaks.  This module is the streaming twin of ``load_table``: same UTC
forcing, same cast, declared schema (no inference pass — a streaming
source must never need a full scan to start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Declared to match the driver testdata events table.  ``ts`` is declared
# TIMESTAMP_NTZ — the type Spark ≥4 assigns to tz-naive parquet timestamps
# — and normalized to canonical TIMESTAMP below (shift-free under UTC).
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def stream_events(
    spark: SparkSession,
    directory: str,
    glob: str | None = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming parquet scan of the events table with the same timestamp
    canonicalization as the batch ``load_table`` — so batch and stream
    agree on bucket keys by construction, not by luck.

    ``directory`` is the folder to watch (streaming file sources take
    directories, not files); ``glob`` narrows it to the events file(s).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
