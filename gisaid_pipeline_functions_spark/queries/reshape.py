"""Reshaping / patching / prevalence query registrations
(SURVEY §1.1.5 wide pivot, §2.10 overlay patching, J5 prevalence,
A10/O5 mean-ranked regions)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

@register(
    "reshape_pivot_wide",
    # K2/W2 sink-side pivot: long (key, week, freq) → wide key×weeks
    # (Time_Series.py:731–788's matrix layout). Long stays canonical; the
    # pivot happens only at the sink (SURVEY §1.1.5). Week columns are
    # derived from the data on BOTH sides (DuckDB dynamic PIVOT / Spark
    # pivot without a values list) so any sf dir's date range works.
    # `max(freq)` ≡ sum here (one row per key×week after the groupBy) and,
    # unlike DuckDB's sum, does NOT widen BIGINT→HUGEINT — keeping the cell
    # type LongType on both engines (registry convention). Missing key×week
    # cells are NULL on both sides.
    """
    PIVOT (
      SELECT event_type AS key,
             CAST(CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS VARCHAR)
               AS week,
             count(*) AS freq
      FROM events GROUP BY 1, 2
    ) ON week USING max(freq)
    """,
)
def reshape_pivot_wide(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    ev = load_table(spark, sf_dir, "events")
    freq = (
        ev.groupBy(
            F.col("event_type").alias("key"),
            sunday_week_start(F.col("ts")).cast("string").alias("week"),
        )
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # pivot width = distinct weeks in the data — bounded (weeks, not rows),
    # so the value-discovery job Spark runs here is a tiny agg, not a scan
    # of the wide table.
    return freq.groupBy("key").pivot("week").agg(F.max("freq"))


@register(
    "patch_motif_overlay",
    # alignment_tools.py:62–90 — find rows whose slice equals an erroneous
    # motif and splice in the correction (substring compare + overlay; the
    # reference loops SeqRecords and rebuilds strings by hand).
    """
    SELECT doc_id,
           CASE WHEN substr(text, 5, 4) = 'fast'
                THEN substr(text, 1, 4) || 'FAST' || substr(text, 9)
                ELSE text END AS patched,
           substr(text, 5, 4) = 'fast' AS was_patched
    FROM documents
    """,
)
def patch_motif_overlay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hit = F.substring("text", 5, 4) == "fast"
    return docs.select(
        "doc_id",
        F.when(hit, F.overlay("text", F.lit("FAST"), F.lit(5), F.lit(4)))
        .otherwise(F.col("text"))
        .alias("patched"),
        hit.alias("was_patched"),
    )


@register(
    "prevalence_share",
    # J5 (Plotting_Functions.py:523–531): frequency sums + percentage-of-
    # total in ONE aggregation + window instead of two merges.
    """
    WITH f AS (
      SELECT n.n_name, count(*) AS n_orders,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, n_orders, revenue,
           round(n_orders * 1.0 / sum(n_orders) OVER (), 6) AS share
    FROM f
    """,
)
def prevalence_share(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    f = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    return f.withColumn("share", F.round(F.col("n_orders") / total, 6))


@register(
    "region_rank_by_mean",
    # A10/O5 (Plotting_Functions.py:1511–1514): regions ranked by mean
    # weekly order count, rank materialized for the hash check.
    """
    WITH wk AS (
      SELECT r.r_name AS region,
             CAST(o.o_orderdate AS DATE)
               - CAST(dayofweek(o.o_orderdate) AS INTEGER) AS week,
             count(*) AS n
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation na ON c.c_nationkey = na.n_nationkey
      JOIN region r ON na.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), m AS (
      SELECT region, round(avg(n), 6) AS mean_weekly FROM wk GROUP BY region
    )
    SELECT region, mean_weekly,
           CAST(row_number() OVER (ORDER BY mean_weekly DESC, region) AS BIGINT)
             AS rank
    FROM m
    """,
)
def region_rank_by_mean(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    wk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(na), c.c_nationkey == na.n_nationkey)
        .join(F.broadcast(r), na.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            sunday_week_start(F.col("o_orderdate")).alias("week"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = wk.groupBy("region").agg(F.round(F.avg("n"), 6).alias("mean_weekly"))
    return m.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("mean_weekly"), F.asc("region")))
        .cast("long"),
    )


@register(
    "reshape_unpivot_long",
    # The reshape family's other direction (the reference melts its wide
    # matrices back to long for plotting, Plotting_Functions.py:339–386):
    # pivot the weekly frequencies wide INSIDE the query, then unpivot
    # back with DataFrame.unpivot (Expand — one pass, no join) and prove
    # the round trip is lossless against the straight long-form oracle.
    # Zero-filled cells from the pivot are dropped on the way back so the
    # melt matches the original sparse long table.
    """
    SELECT event_type AS key,
           CAST(CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS VARCHAR)
             AS week,
           count(*) AS freq
    FROM events GROUP BY 1, 2
    """,
)
def reshape_unpivot_long(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    ev = load_table(spark, sf_dir, "events")
    freq = ev.groupBy(
        F.col("event_type").alias("key"),
        sunday_week_start(F.col("ts")).cast("string").alias("week"),
    ).agg(F.count(F.lit(1)).alias("freq"))
    wide = freq.groupBy("key").pivot("week").agg(F.max("freq")).na.fill(0)
    week_cols = [c for c in wide.columns if c != "key"]
    return (
        wide.unpivot("key", week_cols, "week", "freq")
        .filter(F.col("freq") > 0)
        .select("key", "week", F.col("freq").cast("long").alias("freq"))
    )
