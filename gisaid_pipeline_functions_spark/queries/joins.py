"""Join-family query registrations (SURVEY §2.5 J1–J9, F13)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.joins import annotate_ranges, contingency_2x2
from ..registry import register
from .windows import _SCD2_CTES
from ..sources.tables import load_table


@register(
    "join_large_equi",
    # J1 — big×big inner equi-join (Time_Series.py:497 metadata⋈clusters).
    # Shuffle on the join key; revenue rounded so sum order is hash-stable.
    """
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_large_equi(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "join_broadcast_dims",
    # J2/J3/J4 — small-dimension chain, both hops broadcast
    # (Time_Series.py:613–623, 579; Plotting_Functions.py:62–71).
    """
    SELECT r.r_name, count(*) AS n_customers,
           round(avg(c.c_acctbal), 6) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


@register(
    "join_range_regions",
    # J6 — interval lookup, first-match-wins, 'Other' fallback
    # (Plotting_Functions.py:76–169). Size bands deliberately overlap at
    # [10,15] to exercise the priority rule; 40+ is uncovered → Other.
    """
    WITH regions(name, start, "end", priority) AS (
      VALUES ('tiny', 1, 10, 1), ('small', 10, 15, 2),
             ('medium', 16, 30, 3), ('large', 31, 40, 4)
    ), annotated AS (
      SELECT p.p_partkey,
             coalesce((SELECT r.name FROM regions r
                       WHERE p.p_size >= r.start AND p.p_size <= r."end"
                       ORDER BY r.priority LIMIT 1), 'Other') AS region_name
      FROM part p
    )
    SELECT region_name, count(*) AS n FROM annotated GROUP BY region_name
    """,
)
def join_range_regions(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    regions = spark.createDataFrame(
        [("tiny", 1, 10, 1), ("small", 10, 15, 2), ("medium", 16, 30, 3), ("large", 31, 40, 4)],
        "name string, start int, end int, priority int",
    )
    return (
        annotate_ranges(part, "p_size", regions)
        .groupBy("region_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_contingency_2x2",
    # J9 — 2×2 containment contingency in one grouped pass
    # (Plotting_Functions.py:1243–1315).
    """
    SELECT contains(text, 'spark') AS has_a, contains(text, 'join') AS has_b,
           CAST(sum(n_chars) AS BIGINT) AS total
    FROM documents GROUP BY 1, 2
    """,
)
def join_contingency_2x2(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return contingency_2x2(
        docs,
        F.col("text").contains("spark"),
        F.col("text").contains("join"),
        "n_chars",
    )


@register(
    "join_anti_orphans",
    # F13 — orphan check as a left-anti join (Time_Series.py:619–622 warns
    # on clusters with no variant list).
    """
    SELECT c.c_nationkey, count(*) AS n_orphans
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def join_anti_orphans(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


@register(
    "join_semi_membership",
    # F6 as a semi join — keys present on the other side, no multiplication.
    """
    SELECT DISTINCT n.n_name
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000)
    """,
)
def join_semi_membership(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return n.join(c, n.n_nationkey == c.c_nationkey, "left_semi").select("n_name").distinct()


@register(
    "join_salted_skew",
    # Salted skew join (operators/skew.py): the salt scatters hot keys
    # across R reducers but may not change the RESULT — the oracle is the
    # plain join + aggregate, so any salt leakage (lost/duplicated rows)
    # hash-fails. Salt assignment uses rand(seed) per partition; the
    # output is partition-invariant because every salt bucket joins the
    # same replicated small side.
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark, sf_dir):
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "l_orderkey", salt_buckets=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "join_interval_overlap",
    # Interval × interval overlap join (operators/joins.py:
    # interval_overlap_join): per-user daily activity spans vs per-type
    # daily spans, paired when they intersect. The co-partition bucket
    # (calendar date) turns the non-equi overlap join into an EQUI-join +
    # residual filter — a naive overlap join plans as
    # BroadcastNestedLoopJoin and is O(|A|·|B|) at scale. Strict overlap;
    # duration in exact integer micros on both engines.
    """
    WITH a AS (
      SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS sa, max(ts) AS ea
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, CAST(ts AS DATE) AS day, min(ts) AS sb, max(ts) AS eb
      FROM events GROUP BY 1, 2
    )
    SELECT a.user_id, b.event_type, a.day,
           CAST(epoch_us(least(a.ea, b.eb)) - epoch_us(greatest(a.sa, b.sb))
                AS BIGINT) AS overlap_micros
    FROM a JOIN b ON a.day = b.day
    WHERE greatest(a.sa, b.sb) < least(a.ea, b.eb)
    """,
)
def join_interval_overlap(spark, sf_dir):
    from ..operators.joins import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    a = ev.groupBy("user_id", day).agg(
        F.min("ts").alias("start_a"), F.max("ts").alias("end_a")
    )
    b = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("start_b"), F.max("ts").alias("end_b")
    )
    return interval_overlap_join(a, b, ["day"]).select(
        "user_id", "event_type", "day", "overlap_micros"
    )


@register(
    "join_bloom_prefilter",
    # Bloom-filter semi-join reduction (operators/sketches.py:bloom_build
    # / bloom_might_contain): a constant-size bitset built over the
    # BUILDING-segment customer keys pre-filters orders MAP-SIDE before
    # the join shuffle — the classic 100 TB fact×dim reduction (what
    # Spark's runtime row-level filtering does internally, built here
    # from public primitives so it also works across stages/jobs). The
    # oracle is the PLAIN join: a Bloom filter may only change
    # performance, never results — a false negative (dropped true match)
    # hash-fails this row. tests/test_sketches.py pins the selectivity
    # (the filter must actually drop most non-members) and mergeability.
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 6) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_nationkey
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    from ..operators.sketches import bloom_build, bloom_might_contain

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    bloom = bloom_build(cust.select("c_custkey"), "c_custkey")
    pre = bloom_might_contain(orders, "o_custkey", bloom)
    return (
        pre.join(cust.select("c_custkey", "c_nationkey"),
                 pre.o_custkey == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("revenue"),
        )
    )


@register(
    "join_full_outer_diff",
    # Corpus snapshot diff — the data-versioning operation every managed
    # training corpus runs between releases (the Delta/Iceberg
    # snapshot-compare shape, expressed as a content-hash FULL OUTER
    # join, the one join type the registry didn't yet gate directly):
    # v1 and v2 are deterministic derivations of documents (v1 drops
    # doc_id % 7 == 0, v2 drops % 5 == 0 and edits % 11 == 0), and each
    # surviving id is classified added / removed / changed / unchanged.
    # At 100 TB both sides shuffle hashes on the id — bodies never move;
    # the hash columns ride into the output so the classification itself
    # is value-checked, not just the counts.
    """
    WITH v1 AS (
      SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 7 != 0
    ),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h2
      FROM documents WHERE doc_id % 5 != 0
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, h1, h2,
           CASE WHEN h2 IS NULL THEN 'removed'
                WHEN h1 IS NULL THEN 'added'
                WHEN h1 != h2 THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    """,
)
def join_full_outer_diff(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5("text").alias("h1")
    )
    v2 = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("h2"),
    )
    j = v1.join(v2, "doc_id", "full")
    status = (
        F.when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("doc_id", "h1", "h2", status.alias("status"))


@register(
    "join_edit_distance_fuzzy",
    # Fuzzy self-join at Levenshtein ≤ 1 via deletion neighborhoods
    # (FastSS/SymSpell family) — beyond-reference entity-resolution
    # surface. The oracle is the BRUTE-FORCE quadratic join: the
    # neighborhood trick is lossless for ed ≤ 1, so a dropped or
    # spurious pair hash-fails; the oracle states the contract, not
    # the algorithm.
    """
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
    FROM (SELECT DISTINCT c_name FROM customer) a
    JOIN (SELECT DISTINCT c_name FROM customer) b
      ON a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def join_edit_distance_fuzzy(spark, sf_dir):
    from ..operators.joins import edit_distance_one_pairs

    cust = load_table(spark, sf_dir, "customer")
    return edit_distance_one_pairs(cust, "c_name")


@register(
    "graph_triangle_count",
    # Per-vertex triangle counts over the co-ordered-parts graph
    # (beyond-reference graph analytics, joining the CC family):
    # degree-ordered wedge join, Suri & Vassilvitskii WWW'11 — each
    # triangle is generated at its unique lowest-(degree,id) apex, so
    # hub vertices cannot explode the wedge set (out-degree ≤ O(√m)).
    # The oracle is the BRUTE-FORCE id-ordered 3-way edge join: the
    # orientation trick must find exactly the same triangles, so a
    # missed or duplicated triangle hash-fails. The graph is the
    # HIGH-QUANTITY co-purchase graph (both legs l_quantity ≥ 35): the
    # full co-order graph at sf0.1 is near-complete (avg degree 120,
    # ~72M wedges) — a dense-graph stress test, not an analytics query;
    # the thresholded graph keeps ~124k edges / ~54k triangles at sf0.1.
    """
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 35
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    t AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT a AS vertex FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    )
    GROUP BY vertex
    """,
)
def graph_triangle_count(spark, sf_dir):
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 35)
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return triangle_counts(edges)


# Thresholded co-purchase graph CTEs (produce `e(u, v)`), shared by the
# triangle / pagerank / label-propagation oracles.
_COPURCHASE_E = """li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 35
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""


def _pagerank_ctes(
    iters: int, damping: float = 0.85, graph_ctes: str = _COPURCHASE_E
) -> str:
    """CTE chain replaying operators/graph.py:pagerank iteration by
    iteration on any graph whose CTE prefix produces ``e(u, v)``
    (default: the thresholded co-purchase graph): both-direction edge
    expansion, out-degrees, r0 = round(1/N, 6), then per round the
    contribution sum and the 6dp-rounded damped update. The TextRank
    oracle (queries/text.py) reuses this with the word-graph prefix —
    one iteration-replay implementation for every pagerank consumer."""
    parts = [
        graph_ctes
        + """,
    d AS (
      SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
    ),
    verts AS (SELECT DISTINCT src AS vertex FROM d),
    nn AS (SELECT count(*) AS n FROM verts),
    od AS (SELECT src, count(*) AS odeg FROM d GROUP BY src),
    r0 AS (
      SELECT vertex, round(1.0 / nn.n, 6) AS r FROM verts CROSS JOIN nn
    )"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""c{k} AS (
      SELECT d.dst AS vertex, sum(r.r / od.odeg) AS s
      FROM d JOIN r{p} r ON d.src = r.vertex JOIN od ON d.src = od.src
      GROUP BY d.dst
    ),
    r{k} AS (
      SELECT v.vertex,
             round((1 - {damping}) / nn.n
                   + {damping} * coalesce(c.s, 0), 6) AS r
      FROM verts v CROSS JOIN nn LEFT JOIN c{k} c ON c.vertex = v.vertex
    )"""
        )
    return ",\n    ".join(parts)


_PR_ITERS = 5


@register(
    "graph_pagerank",
    # PageRank on the same thresholded co-purchase graph as
    # graph_triangle_count — fixed-iteration power method with 6dp
    # lattice rounding per round (the k-means/CC fixpoint convention),
    # so the oracle replays all 5 iterations CTE by CTE and a drift in
    # any round's contribution sum, damping update, or no-inlink
    # fallback hash-fails (operators/graph.py:pagerank).
    "WITH "
    + _pagerank_ctes(_PR_ITERS)
    + f"\n    SELECT vertex, r AS pagerank FROM r{_PR_ITERS}",
)
def graph_pagerank(spark, sf_dir):
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 35)
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return pagerank(edges, iterations=_PR_ITERS, damping=0.85)


def _copurchase_edges(spark, sf_dir):
    """Thresholded co-purchase edge list (u < v, distinct) — the shared
    input graph of graph_triangle_count / graph_pagerank /
    graph_label_propagation (SQL twin: _COPURCHASE_E)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 35)
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def _lpa_ctes(iters: int) -> str:
    """CTE chain replaying operators/graph.py:label_propagation round by
    round: per round, neighbor label votes then the per-vertex
    (count desc, label asc) argmax — integer-only, no float lattice."""
    parts = [
        _COPURCHASE_E
        + """,
    d AS (
      SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
    ),
    l0 AS (SELECT DISTINCT src AS vertex, src AS label FROM d)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""v{k} AS (
      SELECT d.dst, l.label, count(*) AS c
      FROM d JOIN l{p} l ON d.src = l.vertex
      GROUP BY d.dst, l.label
    ),
    l{k} AS (
      SELECT dst AS vertex, label FROM (
        SELECT dst, label,
               row_number() OVER (PARTITION BY dst
                                  ORDER BY c DESC, label) AS rn
        FROM v{k})
      WHERE rn = 1
    )"""
        )
    return ",\n    ".join(parts)


_LPA_ITERS = 4


@register(
    "graph_label_propagation",
    # Synchronous LPA community detection on the same thresholded
    # co-purchase graph as the other two graph queries
    # (operators/graph.py:label_propagation). The update is integer-only
    # (vote counts + min-label tie-break), so the oracle replays all 4
    # rounds exactly — a drifted vote count, a wrong tie-break, or a
    # lost vertex in any round hash-fails.
    "WITH "
    + _lpa_ctes(_LPA_ITERS)
    + f"\n    SELECT vertex, CAST(label AS BIGINT) AS community"
    f" FROM l{_LPA_ITERS}",
)
def graph_label_propagation(spark, sf_dir):
    from ..operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir)
    return label_propagation(edges, iterations=_LPA_ITERS).select(
        "vertex", F.col("label").cast("long").alias("community")
    )


def _kcore_ctes(k: int, rounds: int) -> str:
    """CTE chain replaying operators/graph.py:kcore_peel round by round:
    degree count, survivor set (dg >= k), both-endpoint edge filter —
    integer-only, like the LPA replay."""
    parts = [
        _COPURCHASE_E
        + """,
    e0 AS (SELECT u, v FROM e)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""d{r} AS (
      SELECT x, count(*) AS dg FROM (
        SELECT u AS x FROM e{p} UNION ALL SELECT v FROM e{p}) GROUP BY x
    ),
    k{r} AS (SELECT x FROM d{r} WHERE dg >= {k}),
    e{r} AS (
      SELECT u, v FROM e{p}
      WHERE u IN (SELECT x FROM k{r}) AND v IN (SELECT x FROM k{r})
    )"""
        )
    return ",\n    ".join(parts)


_KCORE_K = 10
_KCORE_ROUNDS = 4


@register(
    "graph_kcore",
    # Bounded-round k-core peeling on the shared co-purchase graph
    # (operators/graph.py:kcore_peel). k=10 sits just below the graph's
    # median degree, so the first peel removes a large fraction and the
    # cascade (removals dropping OTHER vertices below k) runs for
    # multiple rounds — each round's degree table, survivor set, and
    # edge filter replayed exactly by the oracle; a drifted degree or a
    # leaked edge in any round hash-fails.
    "WITH "
    + _kcore_ctes(_KCORE_K, _KCORE_ROUNDS)
    + f"""
    SELECT vertex, CAST(count(*) AS BIGINT) AS degree FROM (
      SELECT u AS vertex FROM e{_KCORE_ROUNDS}
      UNION ALL SELECT v FROM e{_KCORE_ROUNDS})
    GROUP BY vertex
    """,
)
def graph_kcore(spark, sf_dir):
    from ..operators.graph import kcore_peel

    edges = _copurchase_edges(spark, sf_dir)
    return kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


_LP_MIN_CN = 2
_LP_K = 100


@register(
    "graph_link_prediction",
    # Common-neighbor / Jaccard link prediction (Liben-Nowell & Kleinberg
    # 2003) on the shared co-purchase graph: score NON-adjacent vertex
    # pairs by |Γ(u)∩Γ(v)| and Jaccard |Γ(u)∩Γ(v)|/|Γ(u)∪Γ(v)|, top-k
    # by (jaccard desc, u, v). Wedge volume is Σ deg(w)² — inherent to
    # common-neighbor enumeration (unlike triangles, every wedge matters,
    # so the orientation trick cannot prune); the thresholded graph
    # bounds max degree at 37 here, and the operator's ``degree_cap``
    # parameter (operators/graph.py:link_prediction, r8) applies the
    # standard hub-truncation mitigation when pointed at a power-law
    # graph. Candidate pairs that are already edges are anti-joined out.
    # Integer counts → fixed-tree ratios.
    "WITH "
    + _COPURCHASE_E
    + f""",
    d AS (
      SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
    ),
    deg AS (SELECT src, count(*) AS dg FROM d GROUP BY src),
    w AS (
      SELECT a.dst AS u, b.dst AS v, count(*) AS cn
      FROM d a JOIN d b ON a.src = b.src AND a.dst < b.dst
      GROUP BY a.dst, b.dst
      HAVING count(*) >= {_LP_MIN_CN}
    ),
    cand AS (
      SELECT w.u, w.v, w.cn FROM w
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = w.u AND e.v = w.v)
    )
    SELECT cand.u, cand.v, CAST(cn AS BIGINT) AS common_neighbors,
           round(cn * 1.0 / (du.dg + dv.dg - cn), 6) AS jaccard
    FROM cand
    JOIN deg du ON cand.u = du.src
    JOIN deg dv ON cand.v = dv.src
    ORDER BY jaccard DESC, cand.u, cand.v LIMIT {_LP_K}
    """,
)
def graph_link_prediction(spark, sf_dir):
    # degree_cap=None here: the thresholded co-purchase graph bounds max
    # degree at ~37, so the exact form matches the oracle. The cap is a
    # REAL operator parameter since r8 (operators/graph.py:
    # link_prediction — deterministic first-D-neighbors truncation,
    # result-invariant when every degree <= cap, probed at 10x on a
    # power-law star graph with the cap active; VERDICT r7 #6).
    from ..operators.graph import link_prediction

    edges = _copurchase_edges(spark, sf_dir).persist()
    return link_prediction(
        edges, min_cn=_LP_MIN_CN, k=_LP_K, degree_cap=None
    )


_BFS_ROUNDS = 4
_BFS_N_SRC = 3


def _bfs_oracle(rounds: int, n_src: int) -> str:
    parts = [
        _COPURCHASE_E,
        "d AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e)",
        (
            f"src AS (SELECT vertex FROM (SELECT DISTINCT u AS vertex FROM e "
            f"UNION SELECT DISTINCT v FROM e) ORDER BY vertex LIMIT {n_src})"
        ),
        "r0 AS (SELECT vertex, 0 AS dist FROM src)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"r{r} AS (SELECT vertex, min(dist) AS dist FROM ("
            f"SELECT vertex, dist FROM r{r - 1} "
            f"UNION ALL "
            f"SELECT d.dst AS vertex, p.dist + 1 AS dist "
            f"FROM r{r - 1} p JOIN d ON d.src = p.vertex"
            f") GROUP BY vertex)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vertex, CAST(dist AS BIGINT) AS dist FROM r{rounds}"
    )


@register(
    "graph_bfs_distance",
    # Bounded-round multi-source BFS (r8; operators/graph.py
    # bfs_distances): hop distance from the nearest of the 3 lowest-id
    # landmark vertices on the shared co-purchase graph — the
    # landmark-distance primitive under routing features and
    # closeness-centrality estimates. The oracle replays every
    # relaxation round (union + min-groupBy) exactly; integer-only.
    _bfs_oracle(_BFS_ROUNDS, _BFS_N_SRC),
)
def graph_bfs_distance(spark, sf_dir):
    from ..operators.graph import bfs_distances

    edges = _copurchase_edges(spark, sf_dir).persist()
    verts = (
        edges.select(F.col("u").alias("vertex"))
        .unionByName(edges.select(F.col("v").alias("vertex")))
        .distinct()
    )
    sources = verts.orderBy("vertex").limit(_BFS_N_SRC)
    return bfs_distances(edges, sources, rounds=_BFS_ROUNDS)


def _hits_ctes(iters: int) -> str:
    """CTE chain replaying operators/graph.py:hits half-round by
    half-round on the customer→part purchase graph: the UNNORMALIZED
    integer power iteration (h₀ = 1, alternating neighbor sums — every
    intermediate an exact BIGINT, no float lattice), then ONE final L1
    quotient per role, 6dp-rounded — the operator's only inexact step,
    so any drift in any half-round hash-fails bit-for-bit."""
    parts = [
        """e AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_quantity >= 45
    ),
    h0 AS (SELECT DISTINCT src AS vertex, CAST(1 AS BIGINT) AS score
           FROM e)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""a{k} AS (
      SELECT e.dst AS vertex, CAST(sum(h.score) AS BIGINT) AS score
      FROM e JOIN h{p} h ON e.src = h.vertex GROUP BY e.dst
    ),
    h{k} AS (
      SELECT e.src AS vertex, CAST(sum(a.score) AS BIGINT) AS score
      FROM e JOIN a{k} a ON e.dst = a.vertex GROUP BY e.src
    )"""
        )
    return ",\n    ".join(parts)


_HITS_ITERS = 4


@register(
    "graph_hits",
    # HITS hubs/authorities on the bipartite customer→part purchase
    # graph (operators/graph.py:hits — r9): 4 power-method rounds with
    # DEFERRED L1 normalization — the iteration is exact-integer
    # message passing (linear lineage, zero in-loop materializations,
    # the pagerank shape), normalized once at the end on the 6dp
    # lattice. Directed twin of graph_pagerank: alternating-key merge
    # joins against two pre-partitioned edge copies.
    "WITH "
    + _hits_ctes(_HITS_ITERS)
    + f""",
    an AS (SELECT sum(score) AS nrm FROM a{_HITS_ITERS}),
    hn AS (SELECT sum(score) AS nrm FROM h{_HITS_ITERS})
    SELECT vertex, 'hub' AS role,
           round(CAST(score AS DOUBLE) / CAST(nrm AS DOUBLE), 6) AS score
    FROM h{_HITS_ITERS} CROSS JOIN hn
    UNION ALL
    SELECT vertex, 'authority' AS role,
           round(CAST(score AS DOUBLE) / CAST(nrm AS DOUBLE), 6) AS score
    FROM a{_HITS_ITERS} CROSS JOIN an""",
)
def graph_hits(spark, sf_dir):
    from ..operators.graph import hits

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )
    return hits(edges, iterations=_HITS_ITERS)


@register(
    "graph_assortativity",
    # Degree assortativity (Newman 2002) of the thresholded co-purchase
    # graph — the one-number topology screen (hub-hub vs hub-spoke) a
    # pipeline runs before trusting graph-derived features. The oracle
    # recomputes the Pearson moments from the brute-force edge list:
    # DECIMAL/HUGEINT-exact Σxy/Σx²/Σy² (the graph_hits overflow
    # convention), single final divide+sqrt on identical trees.
    "WITH "
    + _COPURCHASE_E
    + """,
    d AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM d GROUP BY src),
    ann AS (
      SELECT dx.dg AS x, dy.dg AS y
      FROM d JOIN deg dx ON d.src = dx.src JOIN deg dy ON d.dst = dy.src
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS syy
      FROM ann
    ),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices FROM deg)
    SELECT m AS m_directed, n_vertices,
           round(CAST(CAST(m AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                      AS DOUBLE)
                 / sqrt(CAST(CAST(m AS DECIMAL(38,0)) * sxx
                             - CAST(sx AS DECIMAL(19,0))
                               * CAST(sx AS DECIMAL(19,0)) AS DOUBLE)
                        * CAST(CAST(m AS DECIMAL(38,0)) * syy
                               - CAST(sy AS DECIMAL(19,0))
                                 * CAST(sy AS DECIMAL(19,0)) AS DOUBLE)),
                 6) AS assortativity
    FROM s CROSS JOIN nv
    """,
)
def graph_assortativity(spark, sf_dir):
    from ..operators.graph import degree_assortativity

    return degree_assortativity(_copurchase_edges(spark, sf_dir))


@register(
    "graph_clustering_coeff",
    # Watts–Strogatz local clustering coefficient per vertex of the
    # co-purchase graph (operators/graph.py:local_clustering — rides
    # the degree-ordered triangle_counts wedge join). Oracle: the
    # brute-force id-ordered 3-way edge join for triangles LEFT-joined
    # onto the degree table, so a vertex whose triangles the oriented
    # wedge join misses (or double-counts) hash-fails, and
    # triangle-free degree-≥2 vertices must appear with lcc = 0.
    "WITH "
    + _COPURCHASE_E
    + """,
    t AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri AS (
      SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (
        SELECT a AS vertex FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
      )
      GROUP BY vertex
    ),
    deg AS (
      SELECT vertex, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS vertex FROM e UNION ALL SELECT v FROM e)
      GROUP BY vertex
    )
    SELECT d.vertex, d.degree,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           round(2.0 * CAST(coalesce(t.n_triangles, 0) AS DOUBLE)
                 / (CAST(d.degree AS DOUBLE)
                    * CAST(d.degree - 1 AS DOUBLE)), 6) AS lcc
    FROM deg d LEFT JOIN tri t ON d.vertex = t.vertex
    WHERE d.degree >= 2
    """,
)
def graph_clustering_coeff(spark, sf_dir):
    from ..operators.graph import local_clustering

    return local_clustering(_copurchase_edges(spark, sf_dir))


@register(
    "graph_modularity",
    # Newman modularity Q of the LPA community partition on the
    # co-purchase graph — the partition-quality number reported beside
    # any community detection. ALL-INTEGER: Q = [Σ_c(4m·L_c − d_c²)] /
    # (4m²) with L_c = intra-community edges and d_c = total community
    # degree, so the whole numerator is one exact DECIMAL(38,0) sum
    # (communities with no intra edge still contribute −d_c², via the
    # degree-side left join) and the single final division is one IEEE
    # op. The oracle replays the 4 LPA rounds (shared _lpa_ctes) then
    # recomputes L_c / d_c from the brute-force edge list — a drifted
    # community OR a miscounted intra edge hash-fails.
    "WITH "
    + _lpa_ctes(_LPA_ITERS)
    + f""",
    lab AS (SELECT vertex, label FROM l{_LPA_ITERS}),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
    intra AS (
      SELECT lu.label, CAST(count(*) AS BIGINT) AS lc
      FROM e JOIN lab lu ON e.u = lu.vertex
             JOIN lab lv ON e.v = lv.vertex
      WHERE lu.label = lv.label
      GROUP BY lu.label
    ),
    degc AS (
      SELECT lab.label, CAST(count(*) AS BIGINT) AS dc
      FROM d JOIN lab ON d.src = lab.vertex
      GROUP BY lab.label
    ),
    parts AS (
      SELECT degc.label,
             CAST(4 AS DECIMAL(19,0)) * CAST(mm.m AS DECIMAL(19,0))
               * CAST(coalesce(intra.lc, 0) AS DECIMAL(19,0))
             - CAST(degc.dc AS DECIMAL(19,0))
               * CAST(degc.dc AS DECIMAL(19,0)) AS num
      FROM degc LEFT JOIN intra ON degc.label = intra.label
                CROSS JOIN mm
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_communities,
             CAST(sum(num) AS DECIMAL(38,0)) AS q_num
      FROM parts
    )
    SELECT n_communities, m,
           round(CAST(q_num AS DOUBLE)
                 / CAST(CAST(4 AS DECIMAL(19,0))
                        * CAST(mm.m AS DECIMAL(19,0))
                        * CAST(mm.m AS DECIMAL(19,0)) AS DOUBLE), 6)
             AS q_modularity
    FROM s CROSS JOIN mm
    """,
)
def graph_modularity(spark, sf_dir):
    from ..operators.graph import label_propagation

    # edges feed m, the intra join AND both legs of the degree union;
    # labels feed three joins — persist both or the lineitem self-join
    # and the full 4-round LPA recompute per consumer (the r6
    # persist-before-self-join rule; measured 20.6s -> ~7s at sf0.1)
    edges = _copurchase_edges(spark, sf_dir).persist()
    lab = (
        label_propagation(edges, iterations=_LPA_ITERS)
        .select("vertex", "label")
        .persist()
    )
    # the label frame grows with the graph — merge-hint every join
    # against it (the r6 broadcast-estimate rule)
    lu = lab.select(F.col("vertex").alias("u"), F.col("label").alias("lu"))
    lv = lab.select(F.col("vertex").alias("v"), F.col("label").alias("lv"))
    mm = edges.agg(F.count(F.lit(1)).alias("m"))
    # ONE edges-x-labels join feeds both aggregates: intra-community
    # edge counts AND community degrees (each edge contributes one
    # endpoint to lu's community and one to lv's) — a third label join
    # for degrees would re-shuffle the edge list for nothing
    joined = (
        edges.join(lu.hint("merge"), "u")
        .join(lv.hint("merge"), "v")
        .select("lu", "lv")
        .persist()
    )
    intra = (
        joined.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("lc"))
    )
    degc = (
        joined.select(F.col("lu").alias("label"))
        .unionAll(joined.select(F.col("lv").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    parts = (
        degc.join(intra.hint("merge"), "label", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            (
                F.lit(4).cast("decimal(19,0)")
                * dec("m")
                * F.coalesce(F.col("lc"), F.lit(0)).cast("decimal(19,0)")
                - dec("dc") * dec("dc")
            ).alias("num")
        )
    )
    s = parts.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("num").cast("decimal(38,0)").alias("q_num"),
    )
    return s.crossJoin(F.broadcast(mm)).select(
        "n_communities",
        "m",
        F.round(
            F.col("q_num").cast("double")
            / (F.lit(4).cast("decimal(19,0)") * dec("m") * dec("m")).cast(
                "double"
            ),
            6,
        ).alias("q_modularity"),
    )


@register(
    "join_fuzzy_blocked",
    # Blocked fuzzy matching (the entity-resolution / record-linkage
    # primitive, Christen 2012): candidate pairs from TWO blocking
    # passes over a 24-char title key (prefix-8 and chars 17..24 —
    # multi-pass blocking so a mismatch inside one block window can't
    # hide a pair), distinct-unioned, then verified by exact
    # Levenshtein <= 6. Edit distance is computed ONCE per distinct
    # candidate pair, after the union-dedup; both engines' levenshtein
    # is the classic unit-cost distance (cross-checked). Block keys
    # grow with the corpus -> both self-join sides merge-hinted (the
    # r6 broadcast-estimate rule).
    """
    WITH t AS (
      SELECT doc_id, substr(text, 1, 24) AS title FROM documents
    ),
    k AS (
      SELECT doc_id, title, substr(title, 1, 8) AS b1,
             substr(title, 17, 8) AS b2
      FROM t
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.title AS ta, b.title AS tb
      FROM k a JOIN k b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, a.title, b.title
      FROM k a JOIN k b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS lev_dist
    FROM cand
    WHERE levenshtein(ta, tb) <= 6
    """,
)
def join_fuzzy_blocked(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = docs.select(
        "doc_id",
        F.substring(F.col("text"), 1, 24).alias("title"),
    ).select(
        "doc_id",
        "title",
        F.substring("title", 1, 8).alias("b1"),
        F.substring("title", 17, 8).alias("b2"),
    )

    def side(pfx):
        return k.select(
            F.col("doc_id").alias(f"doc_{pfx}"),
            F.col("title").alias(f"t{pfx}"),
            "b1",
            "b2",
        )

    a, b = side("a"), side("b")

    def block(key):
        return (
            a.drop("b2" if key == "b1" else "b1")
            .hint("merge")
            .join(
                b.drop("b2" if key == "b1" else "b1").hint("merge"),
                key,
            )
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ta", "tb")
        )

    cand = block("b1").unionByName(block("b2")).distinct()
    d = F.levenshtein("ta", "tb")
    return (
        cand.select(
            "doc_a", "doc_b", d.cast("long").alias("lev_dist")
        )
        .filter(F.col("lev_dist") <= 6)
    )


@register(
    "join_point_in_time",
    # Point-in-time (temporal / PIT) join — the lakehouse feature-store
    # lookup: each purchase fact joined to the SCD2 dimension VERSION
    # valid at the fact's timestamp (valid_from <= t < valid_to,
    # NULL-to = current). Spark has no native PIT; since SCD2 versions
    # tile time disjointly per user, PIT == backward as-of on
    # valid_from, expressed as the ONE-SHUFFLE tagged-union carry of
    # join_asof (versions tag 0 sort before facts tag 1 at an equal
    # instant, so a fact lands on the version opening at its own ts) —
    # a range join would fan out facts x all-versions-per-user. The
    # oracle replays the shared SCD2 build (windows.py:_SCD2_CTES,
    # verbatim) and brute-forces the interval containment.
    _SCD2_CTES + """
    SELECT f.event_id, f.user_id, f.t_us, v.event_type AS dim_state,
           v.valid_from_us
    FROM (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us
          FROM events WHERE event_type = 'purchase') f
    JOIN v ON f.user_id = v.user_id
          AND v.valid_from_us <= f.t_us
          AND (v.valid_to_us IS NULL OR f.t_us < v.valid_to_us)
    """,
)
def join_point_in_time(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.timeseries import scd2_history

    ev = load_table(spark, sf_dir, "events")
    dim = scd2_history(ev).select(
        "user_id",
        F.col("event_type").alias("dim_state"),
        "valid_from_us",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us")
    )
    d_tag = dim.select(
        "user_id",
        F.col("valid_from_us").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        "dim_state",
        "valid_from_us",
    )
    f_tag = facts.select(
        "user_id",
        F.col("t_us").alias("t"),
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("string").alias("dim_state"),
        F.lit(None).cast("long").alias("valid_from_us"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "tag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = d_tag.unionByName(f_tag).select(
        "event_id",
        "user_id",
        "tag",
        F.col("t").alias("t_us"),
        F.last("dim_state", ignorenulls=True).over(w).alias("dim_state"),
        F.last("valid_from_us", ignorenulls=True)
        .over(w)
        .alias("valid_from_us"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "t_us", "dim_state", "valid_from_us"
    )
