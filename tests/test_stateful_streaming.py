"""Stateful streaming operator: cumulative per-key totals must equal the
batch aggregation after draining the backlog."""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.sources.tables import load_table
from gisaid_pipeline_functions_spark.streaming.stateful import running_totals


def test_running_totals_match_batch(spark, sf_dir):
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    expected = {
        r["event_type"]: (r["n_events"], r["total_value"]) for r in batch.collect()
    }

    stream_src = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = running_totals(stream_src)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per key per batch — keep each key's LAST
    rows = spark.sql(
        "SELECT key, n_events, total_value FROM running_totals_test"
    ).collect()
    final: dict[str, tuple] = {}
    for r in rows:  # memory sink appends in batch order
        final[r["key"]] = (r["n_events"], r["total_value"])

    assert {k: v[0] for k, v in final.items()} == {
        k: v[0] for k, v in expected.items()
    }
    for k in expected:
        assert abs(final[k][1] - expected[k][1]) < 1e-4
