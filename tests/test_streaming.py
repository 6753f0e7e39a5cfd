"""Streaming weekly aggregation: batch/stream parity over the events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.timeseries import weekly_frequency
from gisaid_pipeline_functions_spark.sources.tables import load_table
from gisaid_pipeline_functions_spark.streaming.source import stream_events
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

    # stream the same parquet as a bounded backlog through the canonical
    # source (same timestamp normalization as load_table — a divergent
    # stream-side ts type silently shifts bucket keys)
    agg = streaming_weekly_frequency(stream_events(spark, sf_dir))
    out = run_stream_to_memory(spark, agg, "weekly_stream_test")
    stream = {(r["week_start"], r["key"]): r["freq"] for r in out.collect()}

    # key-level parity first: bucket KEYS diverging (not just counts) is
    # the signature of a timestamp-type split between batch and stream
    assert set(stream) == set(batch), (
        f"bucket keys diverged: {len(set(batch) - set(stream))} batch-only, "
        f"{len(set(stream) - set(batch))} stream-only"
    )
    assert stream == batch
    assert len(stream) > 0


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    # gap-based sessionization: native session_window over the stream must
    # produce the same (user, start, end, n, total) sessions as the batch
    # lag+cumsum query (queries/advanced.py:ts_sessionize). Session-window
    # streaming aggregations are append-mode only: a session emits once the
    # watermark (event-time max - 1h, computed per batch) passes its end —
    # so drive TWO time-ordered micro-batches and check (a) every emitted
    # session matches the batch result exactly and (b) every batch session
    # safely older than the final watermark was emitted.
    import datetime
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gisaid_pipeline_functions_spark.registry import queries
    from gisaid_pipeline_functions_spark.streaming.sessions import (
        streaming_sessions,
    )
    from gisaid_pipeline_functions_spark.streaming.weekly import (
        run_stream_to_memory,
    )

    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in queries()["ts_session_totals"](spark, sf_dir).collect()
    }

    # split events into two time-ordered files so AvailableNow runs two
    # micro-batches (one file per trigger) and the second batch runs with
    # the first half's watermark
    t = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    half = t.num_rows // 2
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    pq.write_table(t.slice(0, half), src_dir / "part-0.parquet")
    time.sleep(1.1)  # file-source batches order by modification time
    pq.write_table(t.slice(half), src_dir / "part-1.parquet")
    half1_max = max(t.column("ts").slice(0, half).to_pylist())  # pandas Timestamp

    from gisaid_pipeline_functions_spark.streaming.source import stream_events

    stream_src = stream_events(
        spark, str(src_dir), glob=None, max_files_per_trigger=1
    )
    out = run_stream_to_memory(
        spark,
        streaming_sessions(stream_src),
        "sessions_stream_test",
        output_mode="append",
    )
    stream = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }

    assert len(stream) > 0
    for k, v in stream.items():
        assert batch[k] == v, k  # every emitted session exact

    # completeness horizon: sessions whose window end (last event + 30 min
    # gap) is safely before batch 2's watermark (half-1 max ts - 1 h) must
    # all have emitted; 1 s margin keeps boundary semantics out of scope
    if hasattr(half1_max, "to_pydatetime"):  # pandas Timestamp (ns parquet)
        half1_max = half1_max.to_pydatetime()
    horizon = half1_max - datetime.timedelta(hours=1, minutes=30, seconds=1)
    must_emit = {k for k in batch if k[2] < horizon}
    assert must_emit, "test data produced no closable sessions"
    missing = must_emit - set(stream)
    assert not missing, f"{len(missing)} closable sessions never emitted"


def test_weekly_watermark_drops_late_data(spark, tmp_path):
    # Late-data guarantee, tested the way it actually engages: the
    # late-events watermark is the PREVIOUS RUN's committed watermark, so
    # within a single fresh run nothing is "late" yet (late filter = query
    # start). Run 1 commits watermark = max ts - 14d; run 2 (same
    # checkpoint) then receives an event 26 days behind it — the stateful
    # operator must drop it (numRowsDroppedByWatermark) and the append
    # sink must contain only fresh windows.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gisaid_pipeline_functions_spark.streaming.weekly import (
        streaming_weekly_frequency,
    )

    def tbl(rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )

    day_ns = 86_400_000_000_000
    base = 1_704_067_200_000_000_000  # 2024-01-01 UTC
    src = tmp_path / "late_src"
    src.mkdir()
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")

    def run():
        stream_src = (
            spark.readStream.schema(
                "event_id long, ts long, user_id long, event_type string, value double, props string"
            )
            .parquet(str(src))
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
        q = (
            streaming_weekly_frequency(stream_src, watermark="14 days")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    pq.write_table(
        tbl([(i, base + i * day_ns, "fresh") for i in range(0, 41, 5)]),
        src / "part-0.parquet",
    )
    run()  # commits watermark = day 40 - 14d
    pq.write_table(tbl([(100, base, "late")]), src / "part-1.parquet")
    q2 = run()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1, "the 26-days-late event was not dropped"
    rows = spark.read.parquet(out).collect()
    assert rows and {r["key"] for r in rows} == {"fresh"}


def test_streaming_sampler_matches_batch(spark, sf_dir):
    # The deterministic md5-prefix samplers are STATELESS map-side
    # filters, so the identical operator code runs unchanged on a stream
    # and must select the identical row set — the batch/stream-unified
    # sampling story (df.sample would give a different, partitioning-
    # dependent draw on each path).
    from gisaid_pipeline_functions_spark.operators.training import (
        rate_to_hex_threshold,
        stratified_sample,
    )
    from gisaid_pipeline_functions_spark.sources.tables import load_table
    from gisaid_pipeline_functions_spark.streaming.weekly import (
        run_stream_to_memory,
    )

    threshold = F.lit(rate_to_hex_threshold(0.3))
    batch_docs = load_table(spark, sf_dir, "documents")
    batch_ids = {
        r["doc_id"]
        for r in stratified_sample(batch_docs, "doc_id", threshold)
        .select("doc_id")
        .collect()
    }

    stream_docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = run_stream_to_memory(
        spark,
        stratified_sample(stream_docs, "doc_id", threshold).select("doc_id"),
        "sampler_stream_test",
        output_mode="append",
    )
    stream_ids = {r["doc_id"] for r in out.collect()}
    assert stream_ids == batch_ids
    assert 0 < len(stream_ids) < batch_docs.count()


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_stream_source_adapts_to_parquet_ts_unit(spark, sf_dir, tmp_path, unit):
    # The testdata ts storage has drifted across rounds (ns → naive us);
    # stream_events derives its ts DECLARATION from the parquet footer
    # (streaming/source.py:_ts_decl) instead of hardcoding one shape.
    # Write the same events in each precision and assert the stream
    # produces identical wall-clock micros and weekly buckets.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    rows = [
        (1, dt.datetime(2021, 3, 1, 10, 0, 0, 123456), 7, "click", 1.5, "{}"),
        (2, dt.datetime(2021, 3, 7, 23, 59, 59, 999999), 8, "view", 2.0, "{}"),
        (3, dt.datetime(2021, 3, 8, 0, 0, 0, 0), 7, "click", 0.5, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path / f"drift_{unit}"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))

    stream = stream_events(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    got = run_stream_to_memory(
        spark,
        streaming_weekly_frequency(stream, watermark="365 days"),
        f"drift_stream_{unit}",
    )
    by_key = {(r["week_start"].isoformat(), r["key"]): r["freq"] for r in got.collect()}
    # 2021-03-01 is a Monday → Sunday anchor 2021-02-28; 2021-03-07 is
    # itself a Sunday, so both the 23:59:59 view and the 03-08 click
    # land in the 2021-03-07 week
    assert by_key == {
        ("2021-02-28", "click"): 1,
        ("2021-03-07", "view"): 1,
        ("2021-03-07", "click"): 1,
    }


def test_stream_stream_join_matches_batch_across_batches(spark, sf_dir):
    """The attribution pairs must come out of RETAINED join state: the
    driver query streams all clicks in micro-batch 1 and all purchases in
    micro-batch 2, so zero pairs are co-batch. Output must equal the
    batch interval self-join exactly."""
    from gisaid_pipeline_functions_spark.queries.advanced import streaming_join_hash
    from gisaid_pipeline_functions_spark.sources.tables import load_table

    got = sorted(
        (r["user_id"], r["click_ts"], r["purchase_ts"])
        for r in streaming_join_hash(spark, sf_dir).collect()
    )
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    want = sorted(
        (r["user_id"], r["click_ts"], r["purchase_ts"])
        for r in clicks.join(
            purchases,
            F.expr(
                """user_id = p_user AND purchase_ts >= click_ts
                   AND purchase_ts <= click_ts + INTERVAL 30 minutes"""
            ),
        ).collect()
    )
    assert got == want and len(got) > 0
