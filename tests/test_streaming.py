"""Streaming weekly aggregation: batch/stream parity over the events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.timeseries import weekly_frequency
from gisaid_pipeline_functions_spark.sources.tables import load_table
from gisaid_pipeline_functions_spark.streaming.weekly import (
    run_stream_to_memory,
    streaming_weekly_frequency,
)


def test_stream_matches_batch(spark, sf_dir):
    batch_events = load_table(spark, sf_dir, "events")
    batch = {
        (r["week_start"], r["key"]): r["freq"]
        for r in weekly_frequency(batch_events, "ts", "event_type").collect()
    }

    # stream the same parquet as a bounded backlog; ts arrives as long
    # nanos (same parquet quirk) → rebuild the timestamp identically
    # streaming file source needs a directory — glob-filter to the one table
    stream_src = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = streaming_weekly_frequency(stream_src)
    out = run_stream_to_memory(spark, agg, "weekly_stream_test")
    stream = {(r["week_start"], r["key"]): r["freq"] for r in out.collect()}

    assert stream == batch
    assert len(stream) > 0
