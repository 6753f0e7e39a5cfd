"""Sort/limit/top-k query registrations (SURVEY §2.8 O1–O6)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.strings import natural_sort_key
from ..operators.topk import paginate, top_k
from ..registry import register
from ..sources.tables import load_table


@register(
    "topk_by_revenue",
    # O4 — top-10 by aggregate, deterministic tie-break
    # (Plotting_Functions.py:626–641). Planned as TakeOrderedAndProject —
    # no global sort shuffle.
    """
    SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_partkey
    ORDER BY revenue DESC, l_partkey ASC LIMIT 10
    """,
)
def topk_by_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    return top_k(rev, [F.desc("revenue"), F.asc("l_partkey")], 10)


@register(
    "topk_natural_sort",
    # O1 — natural sort by embedded number (natsorted, MSA_Reader.py:782):
    # rank materialized so the order itself is hash-checked.
    """
    WITH k AS (
      SELECT c_name, CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS num
      FROM customer
    )
    SELECT c_name, num,
           CAST(row_number() OVER (ORDER BY num, c_name) AS BIGINT) AS rank
    FROM k
    """,
)
def topk_natural_sort(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    keyed = c.select("c_name", natural_sort_key(F.col("c_name")).alias("num"))
    return keyed.withColumn(
        "rank", F.row_number().over(Window.orderBy("num", "c_name")).cast("long")
    )


@register(
    "topk_first_seen_order",
    # O2 — keys ordered by first appearance (min position)
    # (MSA_Reader.py:845–852): rank by min(ts).
    """
    WITH f AS (SELECT event_type, min(ts) AS first_ts FROM events GROUP BY event_type)
    SELECT event_type, first_ts,
           CAST(row_number() OVER (ORDER BY first_ts, event_type) AS BIGINT) AS rank
    FROM f
    """,
)
def topk_first_seen_order(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type").agg(F.min("ts").alias("first_ts"))
    return firsts.withColumn(
        "rank",
        F.row_number().over(Window.orderBy("first_ts", "event_type")).cast("long"),
    )


@register(
    "topk_pagination",
    # O6 — page slicing for multi-page outputs
    # (Plotting_Functions.py:1059–1073).
    """
    WITH p AS (
      SELECT p_partkey,
             CAST(floor((row_number() OVER (ORDER BY p_partkey) - 1) / 25)
                  AS INT) AS page
      FROM part
    )
    SELECT page, count(*) AS n, min(p_partkey) AS first_key,
           max(p_partkey) AS last_key
    FROM p GROUP BY page
    """,
)
def topk_pagination(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    paged = paginate(part, "p_partkey", 25)
    return paged.groupBy("page").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_partkey").alias("first_key"),
        F.max("p_partkey").alias("last_key"),
    )


@register(
    "sort_uniq_labels",
    # O3 — the reference's literal split-on-'Uniq' int sort
    # (alignment_tools.py:22-26): numeric order of the text AFTER the
    # 'Uniq' marker, NOT lexicographic and NOT first-digit-run order (the
    # 2Cluster prefix digit would fool a generic natural sort). The rank
    # window's input is the distinct label set — aggregate-sized.
    """
    WITH labels AS (
      SELECT DISTINCT '2Cluster_Uniq' || CAST(p_partkey % 137 AS VARCHAR) AS label
      FROM part
    )
    SELECT label,
           CAST(row_number() OVER (
             ORDER BY CAST(string_split(label, 'Uniq')[2] AS BIGINT), label
           ) AS BIGINT) AS rank
    FROM labels
    """,
)
def sort_uniq_labels(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.strings import uniq_sort_key

    part = load_table(spark, sf_dir, "part")
    labels = part.select(
        F.concat(
            F.lit("2Cluster_Uniq"), (F.col("p_partkey") % 137).cast("string")
        ).alias("label")
    ).distinct()
    w = Window.orderBy(uniq_sort_key(F.col("label")), "label")
    return labels.select(
        "label", F.row_number().over(w).cast("long").alias("rank")
    )


@register(
    "topk_skyline",
    # 2-D skyline / Pareto frontier (operators/topk.py:skyline_2d —
    # Borzsony ICDE 2001): the orders no other order dominates on
    # (price HIGH, date EARLY), strict in at least one dim, both-dim
    # ties all kept. Spark runs the block-prefix sort-based plan (no
    # global window, no all-pairs join — the VERDICT r3 #3 rule); the
    # oracle replays the frontier rule through a DIFFERENT code path
    # (one plain window over distinct prices, fine at oracle scale):
    # keep rows whose epoch-day equals the price-group minimum and
    # beats every strictly-higher-price minimum. Price on the exact
    # cents lattice, date as epoch days — all comparisons integer.
    """
    WITH p AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS order_day
      FROM orders
    ),
    g AS (
      SELECT price_cents, min(order_day) AS gy
      FROM p GROUP BY price_cents
    ),
    r AS (
      SELECT price_cents, gy,
             min(gy) OVER (ORDER BY price_cents DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS rmin
      FROM g
    )
    SELECT p.o_orderkey, p.price_cents, p.order_day
    FROM p JOIN r ON p.price_cents = r.price_cents
    WHERE p.order_day = r.gy AND (r.rmin IS NULL OR p.order_day < r.rmin)
    """,
)
def topk_skyline(spark, sf_dir):
    from ..operators.topk import skyline_2d

    orders = load_table(spark, sf_dir, "orders")
    p = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("price_cents"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("order_day"),
    )
    return skyline_2d(p, "price_cents", "order_day").select(
        "o_orderkey", "price_cents", "order_day"
    )
