"""Classic TPC-H decorrelation plan shapes (r9).

The reference's query surface is covered row-by-row in SURVEY §2; these
four add the canonical CORRELATED-SUBQUERY shapes every warehouse user
expects an engine to decorrelate well — min-within-group join-back (Q2),
per-key scalar average (Q17), EXISTS + NOT-EXISTS double correlation
(Q21), and global-scalar + anti-join (Q22) — each expressed as the
aggregate/join plan a 100 TB run needs (one pass over the fact table,
aggregate decorrelation instead of repeated self-semi-joins) while the
DuckDB oracle keeps the textbook correlated form, proving semantic
equivalence, not just replay.

Scale notes: every query aggregates lineitem/orders/customer on their
natural keys (map-side partials, AQE-sized shuffles); none broadcasts a
corpus-growing side (part/supplier/customer all scale with SF — the
merge-hint rule from SCALING.md), and the Q21 shape replaces TPC-H's
two correlated self-joins with ONE per-order aggregate — the classic
rewrite that turns Σ|order|² wedge work into a single groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table


@register(
    "tpch_q2_min_cost_supplier",
    # Q2 shape — min-within-group + join-back (the correlated
    # `= (SELECT min(...) WHERE partkey = outer.partkey)` subquery,
    # decorrelated into one aggregate + one equi-join). Unit price is
    # 6dp-rounded BEFORE the min so both engines pick identical minima;
    # supplier ties break on min(l_suppkey); top-20 under the total
    # order (p_retailprice desc, p_partkey asc).
    """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             round(l_extendedprice / l_quantity, 6) AS unit_price
      FROM lineitem
    ),
    best AS (
      SELECT l_partkey, min(unit_price) AS min_unit_price
      FROM unit GROUP BY l_partkey
    ),
    pick AS (
      SELECT u.l_partkey, b.min_unit_price,
             min(u.l_suppkey) AS best_suppkey
      FROM unit u JOIN best b
        ON u.l_partkey = b.l_partkey AND u.unit_price = b.min_unit_price
      GROUP BY u.l_partkey, b.min_unit_price
    )
    SELECT p.p_partkey, p.p_brand, p.p_retailprice,
           s.s_name AS best_supplier, k.min_unit_price
    FROM pick k
    JOIN part p ON k.l_partkey = p.p_partkey
    JOIN supplier s ON k.best_suppkey = s.s_suppkey
    ORDER BY p.p_retailprice DESC, p.p_partkey LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias(
            "unit_price"
        ),
    )
    best = li.groupBy("l_partkey").agg(
        F.min("unit_price").alias("min_unit_price")
    )
    pick = (
        li.withColumnRenamed("l_partkey", "u_partkey")
        .join(
            best,
            (F.col("u_partkey") == F.col("l_partkey"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .groupBy("l_partkey", "min_unit_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_name").alias("best_supplier")
    )
    return (
        pick.join(part, pick["l_partkey"] == part["p_partkey"])
        .join(supp, pick["best_suppkey"] == supp["s_suppkey"])
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            "best_supplier",
            "min_unit_price",
        )
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
    )


@register(
    "tpch_q17_small_qty_revenue",
    # Q17 shape — per-key scalar average (`l_quantity < 0.2 * (SELECT
    # avg(l_quantity) WHERE l_partkey = outer.l_partkey)`), decorrelated
    # into one per-part aggregate joined back onto the fact scan.
    # Quantities are integral doubles, so sum is order-exact and the
    # 0.2·avg cap is deterministic; it is still 6dp-rounded on both
    # sides per the lattice convention before the strict < compare.
    """
    WITH pa AS (
      SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_cap
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < pa.qty_cap
    """,
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy("l_partkey").agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_cap")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(F.col("p_brand") == "Brand#12")
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "tpch_q21_waiting_suppliers",
    # Q21 shape — the EXISTS + NOT-EXISTS double correlation ("supplier
    # kept a multi-supplier finished order waiting while every other
    # supplier shipped on time"). The ORACLE keeps the textbook
    # correlated-subquery form; the Spark plan uses the aggregate
    # decorrelation (per-order distinct-supplier and distinct-LATE-
    # supplier counts, one groupBy) — qualifying line: this supplier
    # late AND n_supp >= 2 AND n_late_supp = 1. Late = shipped more
    # than 90 days after order date. Top-10 by (numwait desc, suppkey).
    """
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM lo l1
          WHERE l1.late = 1
            AND EXISTS (SELECT 1 FROM lo l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lo l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.late = 1)) w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 10
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .cast("int")
        .alias("late"),
    )
    per = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    waiting = (
        lo.filter(F.col("late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(per, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "tpch_q22_idle_customers",
    # Q22 shape — global scalar subquery + NOT EXISTS anti-join:
    # above-average-balance customers with no open ('O') orders, rolled
    # up per market segment. The scalar average is 6dp-rounded on both
    # sides before the strict > compare (the lattice convention); the
    # Spark side broadcasts the ONE-ROW aggregate (a scalar never grows
    # with SF — the only safe broadcast in this file) and anti-joins
    # orders on custkey.
    """
    WITH ab AS (
      SELECT round(avg(c_acctbal), 6) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
    )
    open_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            open_orders,
            cust["c_custkey"] == open_orders["o_custkey"],
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    # TPC-H Q3 (shipping priority): the canonical 3-way
    # customer-orders-lineitem join with date-range predicates on both
    # fact sides and a top-10 by revenue — the plan-shape benchmark for
    # predicate pushdown through a multi-join (both date filters must
    # reach their scans) and TakeOrderedAndProject (never a global
    # sort). Revenue on the exact cents lattice so the sum order can't
    # flip the ranking; ties broken by orderkey. Dates adapted to this
    # corpus's 1995-2001 span; segment filter = a real c_mktsegment
    # value.
    """
    SELECT l.l_orderkey AS orderkey,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                * 100) AS BIGINT)) / 100.0, 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > DATE '1997-06-30'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-30").cast("date")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("orderkey")).limit(10)
