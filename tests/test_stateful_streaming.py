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


def test_streaming_scd2_merge_multibatch_out_of_order_matches_batch(
    spark, sf_dir, tmp_path
):
    """The foreachBatch SCD2 MERGE must converge to exactly the batch
    build even when a user's events arrive across MULTIPLE micro-batches
    in non-chronological order — the case where a late event resurrects
    a compacted-away change point, which no bounded open-interval state
    can handle (streaming/cdc.py docstring)."""
    from gisaid_pipeline_functions_spark.operators.timeseries import scd2_history
    from gisaid_pipeline_functions_spark.sources.tables import load_table
    from gisaid_pipeline_functions_spark.streaming.cdc import streaming_scd2

    ev = load_table(spark, sf_dir, "events")
    # three interleaved slices: slice i holds every 3rd event BY RECENCY
    # within each user, so each later batch inserts rows BETWEEN the
    # ones already merged (worst-case out-of-order arrival)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    sliced = ev.withColumn("slice", F.row_number().over(w) % 3)
    # write micros, not Spark's default INT96 (the stream source's
    # footer peek declares the schema from the parquet type)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    for i in range(3):
        sliced.filter(F.col("slice") == i).drop("slice").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "ev"))
    # exactly one file per slice -> maxFilesPerTrigger=1 forces 3 batches
    import glob

    n_files = len(glob.glob(str(tmp_path / "ev" / "*.parquet")))
    assert n_files == 3

    got = streaming_scd2(
        spark, str(tmp_path / "ev"), glob="*.parquet", max_files_per_trigger=1
    )
    want = scd2_history(ev)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
