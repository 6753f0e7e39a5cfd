"""Advanced analytic operators beyond the reference's surface: TF-IDF
vectorization, gap-based sessionization, and an as-of join — the window/
temporal operators a training-data pipeline needs that the reference
(which has no lag/rank at all, SURVEY §2.7 note) never had."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from .aggregates import _PSI_ORACLE
from .timeseries import _CUSUM_ORACLE as _TS_CUSUM_ORACLE
from .windows import _DAU_WAU_ORACLE as _WDW_DAU_ORACLE
from .windows import _NEW_RETURNING_ORACLE as _WDW_NEWRET_ORACLE


@register(
    "text_tfidf",
    # TF-IDF per (doc, word): tf = in-doc count, idf = ln(N / df),
    # smooth-free to keep both engines' math identical; top terms only to
    # bound output.
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), w AS (SELECT doc_id, word FROM words WHERE length(word) > 0),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM w)
    SELECT tf.doc_id, tf.word,
           CAST(tf.tf AS BIGINT) AS tf,
           round(ln(n.n * 1.0 / df.df), 6) AS idf,
           round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    WHERE tf.tf >= 3
    """,
)
def text_tfidf(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = w.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    n = w.select(F.count_distinct("doc_id").alias("n"))
    idf = F.log(F.col("n") * 1.0 / F.col("df"))
    return (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n))
        .filter(F.col("tf") >= 3)
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("long").alias("tf"),
            F.round(idf, 6).alias("idf"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


@register(
    "ts_sessionize",
    # Gap-based sessionization: a >30-minute silence per user starts a new
    # session; per-session row counts + value sums. lag + cumulative sum —
    # the analytic-window family the reference never used.
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_no
    """,
)
def ts_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros = full TimestampType precision; a cast-to-long gap would
    # truncate to whole seconds and mis-classify gaps that straddle the
    # 30-minute boundary with sub-second components (the oracle compares
    # full-precision intervals).
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_start = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = ev.withColumn("is_start", is_start).withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "ts_session_totals",
    # Driver hash behind the STREAMING parity claim: this is exactly the
    # output shape of streaming/sessions.py:streaming_sessions (per-user
    # gap sessions keyed by (user, start, end) — no batch-only session_no),
    # and tests/test_streaming.py asserts the streaming session_window
    # emits these very tuples. Green here + the pytest parity = the
    # streaming surface is transitively oracle-gated.
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_no
    """,
)
def ts_session_totals(spark, sf_dir):
    return ts_sessionize(spark, sf_dir).drop("session_no")


@register(
    "join_asof",
    # As-of join: each event matched to the user's most recent prior order
    # (o_orderdate <= ts, latest wins). Spark has no native ASOF — express
    # as a tagged union of both streams sorted by (user, time, tag) with a
    # last_value-IGNORE-NULLS running carry-forward: ONE shuffle, no
    # intermediate fan-out. (A ranged join + row_number would materialize
    # events × all-prior-orders-per-user — the scale-killer shape at deep
    # per-user histories.) DuckDB verifies with its native ASOF JOIN.
    # Custom-operator slot (a) from the brief: composition of existing
    # DataFrame ops.
    # right side deduplicated to one row per (customer, date) — with ties
    # on the as-of key, ASOF's pick is engine-arbitrary
    """
    WITH o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
    FROM events e
    ASOF JOIN o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
)
def join_asof(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    # Tag streams: orders sort BEFORE events at an equal instant (tag 0 < 1)
    # so an order dated exactly at the event timestamp is matched (<=).
    o_tag = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    e_tag = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("date").alias("o_orderdate"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "tag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = o_tag.unionByName(e_tag).select(
        "event_id",
        "user_id",
        "tag",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
    )
    # inner-ASOF semantics: events with no prior order drop out
    return merged.filter(
        (F.col("tag") == 1) & F.col("last_orderkey").isNotNull()
    ).select("event_id", "user_id", "last_orderkey", "last_orderdate")


@register(
    "streaming_weekly_hash",
    # The STREAMING ENGINE's own output under a driver hash (not just the
    # transitive pytest parity): streaming_weekly_frequency runs to
    # completion over the bounded events backlog (AvailableNow → memory
    # sink) through the canonical stream source, and the materialized
    # result is oracle-compared like any batch query. A watermark, window
    # or source-normalization regression flips this hash.
    """
    SELECT CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS week_start,
           event_type AS key, count(*) AS freq
    FROM events GROUP BY 1, 2
    """,
)
def streaming_weekly_hash(spark, sf_dir):
    import uuid

    from ..streaming.source import stream_events
    from ..streaming.weekly import (
        run_stream_to_memory,
        streaming_weekly_frequency,
    )

    return run_stream_to_memory(
        spark,
        streaming_weekly_frequency(stream_events(spark, sf_dir)),
        "weekly_stream_drv_" + uuid.uuid4().hex[:8],
    )


@register(
    "streaming_sessions_hash",
    # session_window's closed-session output under a DIRECT driver hash:
    # the events backlog streams as three time-ordered micro-batches —
    # the real events, then two far-future per-user sentinel events whose
    # only job is to advance the event-time watermark past every real
    # session's end — so append mode emits the COMPLETE real session set
    # (sentinel sessions start after the real max ts and are filtered
    # out). The materialized sink must hash-match the batch lag+cumsum
    # oracle exactly; any divergence between session_window's half-open
    # merge and the batch gap rule, or any watermark regression, flips
    # this row.
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_no
    """,
)
def streaming_sessions_hash(spark, sf_dir):
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..queries.roundtrip import _scratch_dir
    from ..streaming.sessions import streaming_sessions
    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    src = _scratch_dir("gisaid_sessions_stream_")
    t = pq.read_table(f"{sf_dir}/events.parquet")
    ts_type = t.schema.field("ts").type
    max_ts = pa.compute.max(t.column("ts")).as_py()
    users = pa.compute.unique(t.column("user_id")).to_pylist()

    def sentinel(offset_us, ids):
        import datetime

        ts_val = max_ts + datetime.timedelta(microseconds=offset_us)
        return pa.table(
            {
                "event_id": pa.array(
                    [10_000_000 + i for i in range(len(ids))], pa.int64()
                ),
                "ts": pa.array([ts_val] * len(ids), ts_type),
                "user_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(["sentinel"] * len(ids)),
                "value": pa.array([0.0] * len(ids)),
                "props": pa.array(["{}"] * len(ids)),
            }
        )

    pq.write_table(t, f"{src}/part-0.parquet")
    # sentinel 1: per-user event 2h after the real max — outside every
    # real session's 30-min gap; sentinel 2: single event 6h after, so
    # the third batch runs with watermark = max+5h > every real session
    pq.write_table(sentinel(7_200_000_000, users), f"{src}/part-1.parquet")
    pq.write_table(sentinel(21_600_000_000, users[:1]), f"{src}/part-2.parquet")
    for i in range(3):  # file-source batch order = modification time
        os.utime(f"{src}/part-{i}.parquet", (1_700_000_000 + i * 10,) * 2)

    out = run_stream_to_memory(
        spark,
        streaming_sessions(
            stream_events(spark, src, glob=None, max_files_per_trigger=1)
        ),
        "sessions_stream_drv_" + uuid.uuid4().hex[:8],
        output_mode="append",
    )
    from pyspark.sql import functions as SF

    return out.filter(SF.col("session_start") <= SF.lit(max_ts))


@register(
    "streaming_enrich_hash",
    # Stream-STATIC join under a direct driver hash — the one Structured
    # Streaming join shape the registry didn't yet prove (weekly window,
    # session_window, and stateful dedup are covered). The events stream
    # broadcast-joins the static customer dimension per micro-batch
    # (stateless — no state store), then the Sunday-anchored weekly
    # aggregation runs per market segment; the materialized AvailableNow
    # output must hash-match the batch join+agg oracle. A regression in
    # stream-static join semantics, the broadcast, or the watermark
    # interplay flips this row.
    """
    SELECT CAST(e.ts AS DATE) - CAST(dayofweek(e.ts) AS INTEGER) AS week_start,
           c.c_mktsegment AS segment, count(*) AS freq,
           round(sum(e.value), 6) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_enrich_hash(spark, sf_dir):
    import uuid

    from ..sources.tables import load_table
    from ..streaming.enrich import streaming_weekly_by_dim
    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    out = streaming_weekly_by_dim(
        stream_events(spark, sf_dir), dim, join_col="user_id", dim_col="segment"
    )
    return run_stream_to_memory(
        spark, out, "enrich_stream_drv_" + uuid.uuid4().hex[:8]
    )


@register(
    "streaming_join_hash",
    # Stream-STREAM interval join under a direct driver hash — the final
    # Structured Streaming join shape (windows, sessions, stateful dedup,
    # and stream-static enrich are already driver-proven). The events
    # backlog streams as TWO time-ordered micro-batch files — all clicks
    # first, all purchases second — so every attribution pair crosses a
    # micro-batch boundary and can only be produced from RETAINED
    # click-side join state (a state-store regression emits zero rows,
    # not approximately-right rows). Watermarks on both sides + the
    # event-time range predicate give Spark the eviction bound; the
    # global watermark stays at the epoch until the purchase side sees
    # data, so no click state can be evicted before batch 2 joins it.
    # Oracle: the equivalent batch interval self-join.
    """
    SELECT a.user_id, a.ts AS click_ts, b.ts AS purchase_ts,
           round(a.value, 6) AS click_value,
           round(b.value, 6) AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def streaming_join_hash(spark, sf_dir):
    import os
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..queries.roundtrip import _scratch_dir
    from ..streaming.join import streaming_click_attribution
    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    src = _scratch_dir("gisaid_join_stream_")
    t = pq.read_table(f"{sf_dir}/events.parquet")
    for i, kind in enumerate(("click", "purchase")):
        pq.write_table(
            t.filter(pc.equal(t.column("event_type"), kind)),
            f"{src}/part-{i}.parquet",
        )
        # file-source batch order = modification time
        os.utime(f"{src}/part-{i}.parquet", (1_700_000_000 + i * 10,) * 2)
    return run_stream_to_memory(
        spark,
        streaming_click_attribution(
            stream_events(spark, src, glob=None, max_files_per_trigger=1)
        ),
        "join_stream_drv_" + uuid.uuid4().hex[:8],
        output_mode="append",
    )


@register(
    "streaming_dropdup_watermark",
    # Spark's BUILT-IN streaming dedup operator
    # (dropDuplicatesWithinWatermark) under a driver hash — the idiomatic
    # complement to the custom applyInPandasWithState first-seen dedup
    # (streaming/dedup.py): the events backlog streams through a
    # 365-day watermark wide enough that no in-data duplicate falls
    # outside the dedup window, so append-mode output = exactly one row
    # per distinct (week_start, event_type). The dedup subset IS the full
    # projected row, so whichever physical row survives, the output tuple
    # is identical — deterministic by construction, and the oracle is
    # plain batch DISTINCT. A watermark/state-eviction regression emits
    # dupes and flips the hash.
    """
    SELECT DISTINCT
           CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS week_start,
           event_type
    FROM events
    """,
)
def streaming_dropdup_watermark(spark, sf_dir):
    import uuid

    from ..functions.weeks import sunday_week_start
    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    ev = stream_events(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "365 days")
        .select(
            F.col("ts"),
            sunday_week_start(F.col("ts")).alias("week_start"),
            F.col("event_type"),
        )
        .dropDuplicatesWithinWatermark(["week_start", "event_type"])
        .select("week_start", "event_type")
    )
    return run_stream_to_memory(
        spark,
        dedup,
        "dropdup_stream_drv_" + uuid.uuid4().hex[:8],
        output_mode="append",
    )


# Per-type top-3 oracle — shared semantics for the batch shape and the
# streaming twin: per (event_type, user_id) counters, then the
# (n desc, user asc) rank read off the counter state.
_STREAM_TOPK_ORACLE = """
    WITH c AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n,
             round(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                   / 1000000.0, 6) AS total_value
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, n, total_value, rk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                        ORDER BY n DESC, user_id)
                     AS BIGINT) AS rk
      FROM c)
    WHERE rk <= 3
    """


@register(
    "streaming_topk_hash",
    # Streaming top-k maintenance (r9): the leaderboard shape a live
    # ranking service runs — per-(event_type, user) counters maintained
    # by a complete-mode streaming aggregation (state store carries one
    # long + one 6dp sum per key, the constant-size-state rule), with
    # the top-3 RANK applied on read over the materialized counter
    # state — exactly how production serves top-k: rank at query time
    # over the state store, never rank-inside-the-stream (window
    # functions aren't incremental). The AvailableNow output must
    # hash-match the batch oracle; value sums ride the 1e-6 integer
    # lattice map-side (the time-decay convention) so stream-side
    # micro-batch addition order can't drift the 6dp totals.
    _STREAM_TOPK_ORACLE,
)
def streaming_topk_hash(spark, sf_dir):
    import uuid

    from pyspark.sql import Window

    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    counters = (
        stream_events(spark, sf_dir)
        .select(
            "event_type",
            "user_id",
            F.floor(F.col("value") * 1000000.0 + 0.5).cast("long").alias("v_u"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_u").alias("sv_u"))
    )
    state = run_stream_to_memory(
        spark, counters, "topk_stream_drv_" + uuid.uuid4().hex[:8]
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        state.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            "event_type",
            "user_id",
            "n",
            F.round(F.col("sv_u") / 1000000.0, 6).alias("total_value"),
            "rk",
        )
    )


@register(
    "streaming_psi_hash",
    # Streaming twin of profile_psi_drift (r9 — the live drift monitor
    # a model-serving fleet actually runs): the decile cut vector is
    # PINNED from the batch reference window before the stream starts
    # (the classifier/time-decay model-pinning convention — per-batch
    # cuts would re-anchor every micro-batch), bucket + window tags are
    # map-side in the stream, and a complete-mode aggregation maintains
    # the per-bucket (n_ref, n_cur) counters — two longs per bucket of
    # state. The PSI shares/terms/total are computed ON READ over the
    # 10-row materialized state (rank-at-query-time, the
    # streaming_topk_hash convention). Must hash-match the batch PSI
    # oracle exactly.
    _PSI_ORACLE,
)
def streaming_psi_hash(spark, sf_dir):
    import uuid

    from pyspark.sql import Window

    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    ev = load_table(spark, sf_dir, "events")
    split_ts = F.lit("2024-01-16").cast("timestamp")
    cuts_row = (
        ev.filter(F.col("ts") < split_ts)
        .agg(
            *[
                F.round(F.percentile("value", F.lit(x / 10.0)), 6).alias(
                    f"c{x}"
                )
                for x in range(1, 10)
            ]
        )
        .collect()[0]
    )
    bucket = sum(
        (F.round(F.col("value"), 6) > F.lit(float(cuts_row[f"c{x}"]))).cast(
            "int"
        )
        for x in range(1, 10)
    ).cast("long")
    counters = (
        stream_events(spark, sf_dir)
        .select(
            bucket.alias("bucket"),
            (F.col("ts") < split_ts).cast("int").alias("is_ref"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    state = run_stream_to_memory(
        spark, counters, "psi_stream_drv_" + uuid.uuid4().hex[:8]
    )
    wall = Window.partitionBy()
    pa = F.round(
        (F.col("n_ref") + 1).cast("double")
        / (F.sum("n_ref").over(wall) + 10),
        6,
    )
    pb = F.round(
        (F.col("n_cur") + 1).cast("double")
        / (F.sum("n_cur").over(wall) + 10),
        6,
    )
    terms = state.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
    )
    return terms.select(
        "bucket",
        "n_ref",
        "n_cur",
        "psi_term",
        F.round(F.sum("psi_term").over(wall), 6).alias("psi_total"),
    )


@register(
    "join_asof_forward",
    # Forward as-of join — pandas merge_asof(direction="forward"),
    # applied as conversion attribution: each CLICK matched to the same
    # user's EARLIEST purchase at-or-after the click (ts >= click ts,
    # earliest wins; a same-instant purchase counts — inclusive >=).
    # Same one-shuffle tagged-union carry as join_asof, mirrored:
    # clicks sort BEFORE purchases at an equal instant (tag 0 < 1) and
    # the carry is FIRST-ignore-nulls over the forward window — no
    # ranged join materializing clicks × all-later-purchases (the
    # scale-killer shape at deep per-user histories). Purchases
    # deduplicated to one per (user, ts) — min event_id — because
    # ASOF's pick among exact-tie rows is engine-arbitrary. DuckDB
    # verifies with native ASOF JOIN, which accepts >= for forward.
    """
    WITH p AS (
      SELECT user_id, ts, min(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts
      FROM events WHERE event_type = 'click'
    )
    SELECT c.click_id, c.user_id,
           p.purchase_id, p.ts AS purchase_ts
    FROM c
    ASOF JOIN p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    c_tag = clicks.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("tag"),
        "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("timestamp").alias("purchase_ts"),
    )
    p_tag = purchases.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        "purchase_id",
        F.col("ts").alias("purchase_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "tag").rowsBetween(
        0, Window.unboundedFollowing
    )
    merged = c_tag.unionByName(p_tag).select(
        "click_id",
        "user_id",
        "tag",
        F.first("purchase_id", ignorenulls=True).over(w).alias(
            "purchase_id"
        ),
        F.first("purchase_ts", ignorenulls=True).over(w).alias(
            "purchase_ts"
        ),
    )
    return merged.filter(
        (F.col("tag") == 0) & F.col("purchase_id").isNotNull()
    ).select("click_id", "user_id", "purchase_id", "purchase_ts")


@register(
    "profile_k_anonymity",
    # k-anonymity audit (Sweeney 2002) over the quasi-identifier set
    # (customer nation, order year, order priority) — the privacy
    # check run before releasing an analytics extract: every
    # equivalence class's size k, summarized as a class-size histogram
    # (k=1 singletons are direct re-identifications, k<5 the usual
    # red line) plus each bucket's share of rows. Pure integer
    # group-bys: one shuffle to QI classes, a second over the 4-row
    # bucket frame; nation is a broadcast dim. The only float is the
    # final share division.
    """
    WITH qi AS (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
             o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS k
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(sum(k) AS BIGINT) AS n_rows_total FROM qi),
    b AS (
      SELECT CASE WHEN k = 1 THEN 'k=1'
                  WHEN k < 5 THEN 'k=2-4'
                  WHEN k < 10 THEN 'k=5-9'
                  ELSE 'k>=10' END AS k_bucket,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(k) AS BIGINT) AS n_rows
      FROM qi GROUP BY 1
    )
    SELECT k_bucket, n_classes, n_rows,
           round(CAST(n_rows AS DOUBLE) / CAST(n_rows_total AS DOUBLE), 6)
             AS row_share
    FROM b CROSS JOIN tot
    """,
)
def profile_k_anonymity(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    qi = (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            F.year("o_orderdate").alias("yr"),
            F.col("o_orderpriority").alias("priority"),
        )
        .join(cust, "c_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy("nation", "yr", "priority")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tot = qi.agg(F.sum("k").cast("long").alias("n_rows_total"))
    b = qi.groupBy(
        F.when(F.col("k") == 1, "k=1")
        .when(F.col("k") < 5, "k=2-4")
        .when(F.col("k") < 10, "k=5-9")
        .otherwise("k>=10")
        .alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    return b.crossJoin(F.broadcast(tot)).select(
        "k_bucket",
        "n_classes",
        "n_rows",
        F.round(
            F.col("n_rows").cast("double")
            / F.col("n_rows_total").cast("double"),
            6,
        ).alias("row_share"),
    )


@register(
    "streaming_cusum_hash",
    # Streaming twin of ts_cusum_changepoint — the live level-shift
    # monitor: the stream maintains only the per-(event_type, week)
    # counters in complete mode (two longs per key of state, the
    # streaming_weekly convention), and the CUSUM walk + |peak| argmax
    # run ON READ over the materialized weeks-x-types state (the
    # rank-at-query-time convention of streaming_topk/psi). Exact
    # integer arithmetic end-to-end (cusum_k = sum of n_i*W - total),
    # hash-gated against the identical batch oracle
    # (timeseries.py:_CUSUM_ORACLE, shared verbatim).
    _TS_CUSUM_ORACLE,
)
def streaming_cusum_hash(spark, sf_dir):
    import uuid

    from pyspark.sql import Window

    from ..functions.weeks import sunday_week_start
    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    wk = (
        stream_events(spark, sf_dir)
        .groupBy(
            "event_type",
            sunday_week_start(F.col("ts")).alias("week_start"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    state = run_stream_to_memory(
        spark, wk, "cusum_stream_drv_" + uuid.uuid4().hex[:8]
    )
    # (W, total) as same-partition window aggregates, not a self-join:
    # a MemorySink table can't self-join (conflicting attribute ids),
    # and one event_type-partitioned shuffle serves all three windows
    wt = Window.partitionBy("event_type")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("week_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = state.select(
        "event_type",
        "week_start",
        F.sum(
            F.col("n") * F.count(F.lit(1)).over(wt)
            - F.sum("n").over(wt)
        )
        .over(wc)
        .alias("cusum"),
    )
    wp = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "week_start"
    )
    return (
        c.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("week_start").alias("peak_week"),
            F.col("cusum").cast("long").alias("cusum_scaled"),
        )
    )


@register(
    "streaming_dau_hash",
    # Streaming twin of window_dau_wau (shared _DAU_WAU_ORACLE
    # verbatim): the stream's only state is the DEDUPED (user, day)
    # pair set — a complete-mode groupBy over the backlog, the minimal
    # state a live engagement dashboard keeps — and the bounded 7-day
    # contribution explode + distinct counts run ON READ over the
    # materialized pairs (the rank-at-query-time convention).
    _WDW_DAU_ORACLE,
)
def streaming_dau_hash(spark, sf_dir):
    import uuid

    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    pairs = (
        stream_events(spark, sf_dir)
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    state = run_stream_to_memory(
        spark, pairs, "dau_stream_drv_" + uuid.uuid4().hex[:8]
    ).select("user_id", "d")
    contrib = state.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "d",
    ).select("user_id", F.date_add("d", F.col("k")).alias("t"))
    wau = contrib.groupBy("t").agg(
        F.count_distinct("user_id").alias("wau")
    )
    dau = state.groupBy(F.col("d").alias("t")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return dau.join(wau, "t").select(
        F.col("t").alias("day"),
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 6
        ).alias("stickiness"),
    )


@register(
    "streaming_new_users_hash",
    # Streaming twin of window_new_vs_returning (shared
    # _NEW_RETURNING_ORACLE verbatim): the stream keeps only the
    # per-(user, day) event counters (complete mode); first-seen
    # classification and the daily split run on read over the
    # materialized pairs — the same minimal-state shape as
    # streaming_dau_hash.
    _WDW_NEWRET_ORACLE,
)
def streaming_new_users_hash(spark, sf_dir):
    import uuid

    from ..streaming.source import stream_events
    from ..streaming.weekly import run_stream_to_memory

    pairs = (
        stream_events(spark, sf_dir)
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    state = run_stream_to_memory(
        spark, pairs, "newret_stream_drv_" + uuid.uuid4().hex[:8]
    )
    # first-seen via a user-partitioned window (a MemorySink table
    # can't self-join — the streaming_cusum_hash rule)
    w = Window.partitionBy("user_id")
    j = state.withColumn("first_day", F.min("d").over(w))
    is_new = (F.col("d") == F.col("first_day")).cast("long")
    return j.groupBy(F.col("d").alias("day")).agg(
        F.sum(is_new).alias("new_users"),
        F.sum(1 - is_new).alias("returning_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(
            F.sum(is_new).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("new_share"),
    )
