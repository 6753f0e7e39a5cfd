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

The ``ts`` declaration is NOT hardcoded: testdata timestamp storage has
drifted across rounds (``timestamp[ns]`` → tz-naive ``timestamp[us]``),
and while ``load_table`` adapts via the parquet footer, a hardcoded
stream schema would silently mis-read the next drift. A streaming source
still must declare its schema up front, so we do the same footer peek —
one metadata read of one file, not a data scan — and fall back to the
current testdata shape (tz-naive micros) when the directory is empty.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Non-timestamp columns of the driver testdata events table; the ts
# declaration is derived per-directory from the parquet footer.
_EVENTS_FIELDS = (
    "event_id long, ts {ts_decl}, user_id long, "
    "event_type string, value double, props string"
)

# The shape of the CURRENT testdata (tz-naive micros → TIMESTAMP_NTZ in
# Spark ≥4) — used only when no file exists yet to peek at.
EVENTS_STREAM_SCHEMA = _EVENTS_FIELDS.format(ts_decl="timestamp_ntz")


def _ts_decl(directory: str, glob: str | None) -> str:
    """Spark DDL type to DECLARE for the parquet ``ts`` column, from the
    footer of the first matching file (mirrors ``sources.tables._ts_cols``):

    * ``timestamp[ns]``  — undeclarable as a Spark timestamp
      ([PARQUET_TYPE_ILLEGAL]); declared ``long`` (with the nanosAsLong
      legacy conf) and rebuilt to micros below.
    * tz-naive us/ms — TIMESTAMP_NTZ in Spark ≥4; cast below.
    * tz-aware — already canonical TIMESTAMP.
    """
    matches = sorted(_glob.glob(os.path.join(directory, glob or "*.parquet")))
    if not matches:
        return "timestamp_ntz"
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    field = pq.read_schema(matches[0]).field("ts")
    if not pat.is_timestamp(field.type):
        raise TypeError(
            f"events stream: 'ts' in {matches[0]} is {field.type}, not a "
            "parquet timestamp — testdata drifted past every known shape; "
            "extend streaming/source.py:_ts_decl alongside "
            "sources/tables.py:_ts_cols"
        )
    if field.type.unit == "ns":
        return "long"
    return "timestamp" if field.type.tz is not None else "timestamp_ntz"


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
    ts_decl = _ts_decl(directory, glob)
    if ts_decl == "long":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(_EVENTS_FIELDS.format(ts_decl=ts_decl))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(directory)
    if ts_decl == "long":
        # INTEGER-divide nanos → micros (matches load_table's rebuild and
        # DuckDB's TIMESTAMP_NS truncation; float division rounds up 1µs)
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


# Non-stream-specific columns of the documents table (no timestamps — a
# stateless projection/enrichment stream needs no watermark).
DOCUMENTS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_documents(
    spark: SparkSession,
    directory: str,
    glob: str | None = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming parquet scan of the documents table — the live-corpus
    twin of ``load_table(..., 'documents')`` for continuous-ingest
    scoring/dedup stages. Declared schema (a streaming source must never
    need a data scan to start); no timestamp columns, so no
    canonicalization pass is required."""
    reader = spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)
