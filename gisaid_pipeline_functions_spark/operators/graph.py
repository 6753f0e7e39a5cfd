"""Graph analytics operators (beyond-reference, joins the CC family at
operators/dedup.py:connected_components / connected_components_star).

Triangle counting is the canonical "curse of the last reducer" problem:
the naive wedge join explodes on hub vertices (a degree-d vertex yields
d² wedges). The degree-ordering trick (Suri & Vassilvitskii, WWW'11
"Counting Triangles and the Curse of the Last Reducer") orients every
edge from the lower-(degree, id) endpoint to the higher one; each
triangle then has exactly ONE source vertex generating its wedge, and a
vertex's out-degree in the oriented graph is O(√m), bounding total
wedges by O(m^1.5) regardless of skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph.

    Input: ``(u, v)`` distinct undirected edges with ``u < v`` (no
    self-loops). Output: ``(vertex, n_triangles)`` for every vertex in
    at least one triangle.

    Why it scales to 100 TB:
    - Edges are re-oriented by the total order (degree, id) — a map-side
      comparison after one degree aggregation; no global rank window.
    - The wedge join and the closing-edge check are equi-joins on vertex
      keys whose fan-out the orientation provably bounds (out-degree ≤
      O(√m)); a hub of degree 10⁶ contributes √-bounded wedges instead
      of 10¹² pairs.
    - Every frame (edges, degrees, wedges) GROWS WITH THE GRAPH, so the
      joins are merge-hinted — the static planner's post-aggregation
      size estimates cannot be trusted not to broadcast them (the r6
      prefix-filter lesson, SCALING.md).
    - Each triangle is found exactly once (at its unique lowest-order
      apex), then exploded to its three vertices for the final count.
    """
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    keyed = edges.join(du.hint("merge"), "u").join(dv.hint("merge"), "v")
    # orient: src = lower (degree, id) endpoint
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # persist: the oriented edge list feeds THREE consumers (ab, bc, ac)
    # — without it the static plan replays the whole edge-generation +
    # degree-join subtree per consumer (observed 9 copies), the same
    # diamond-reuse problem dedup_cluster_size_histogram hit (r6 fix).
    # Two longs per edge: the standard persistent artifact of every
    # multi-pass graph algorithm. LIFETIME (ADVICE r6): the cache is
    # never explicitly unpersisted — the returned frame is lazy, so
    # there is no safe point inside this function to release it. That
    # is the documented trade-off of every persist-under-lazy operator
    # here (phash_near_dups, cluster-size histogram); long-lived
    # sessions that run many such operators back-to-back should call
    # spark.catalog.clearCache() between them (tools/sweep.py does).
    directed = keyed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).persist()
    ab = directed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = directed.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = directed.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = ab.join(bc.hint("merge"), "b")
    triangles = wedges.join(ac.hint("merge"), ["a", "c"])
    return (
        triangles.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame, iterations: int = 5, damping: float = 0.85
) -> DataFrame:
    """PageRank over an undirected simple graph — fixed-iteration power
    method (Page et al. 1999; the canonical bulk-iterative graph job,
    joining triangle counting in the beyond-reference graph family).

    Input: ``(u, v)`` distinct undirected edges with ``u < v``. Output:
    ``(vertex, pagerank)`` for every vertex, after ``iterations`` rounds
    of ``r' = (1-d)/N + d·Σ_in r/outdeg``. Undirected edges expand to
    both directions, so every vertex has out-degree ≥ 1 — no dangling
    mass to redistribute. Ranks are ROUNDED to 6dp every iteration (the
    k-means/CC fixpoint convention, operators/similarity.py:259): each
    round's state lands on a lattice both engines agree on, so a DuckDB
    oracle replays the exact iterations CTE by CTE.

    Scale shape:
    - Each iteration is ONE edge-keyed equi-join (ranks ⋈ edges on src)
      plus one groupBy(dst) with map-side partial aggregation — the
      standard message-passing round; nothing materializes more than
      |E| contribution rows, and AQE handles hub skew on dst.
    - The directed edge list and out-degree table feed EVERY iteration
      and are persisted once (2 longs/edge — the same persistent
      artifact as triangle counting's oriented edges; same documented
      cache lifetime).
    - Edge- and vertex-sized frames GROW WITH THE GRAPH, so their joins
      are merge-hinted (the r6 static-planner-broadcast rule); only the
      1-row vertex count broadcasts.
    - Lineage is LINEAR in iterations (each rank state has a single
      consumer), so no per-iteration persist is needed; 5 rounds ≈ 11
      stages end-to-end.
    """
    # ONE shuffle of the edge list, reused by every iteration: the
    # cached InMemoryRelation preserves its HashPartitioning(src) and
    # within-partition sort, so each round's merge join shuffles/sorts
    # only the vertex-sized rank frame — the big |E| side streams from
    # cache with its Exchange and Sort elided (the Pregel-style
    # partitioning reuse). At sf0.1 the effect is wall-clock noise
    # (~3%: a 250k-row shuffle is cheap on one box), but the executed
    # plan confirms ZERO Exchanges above the cached edge scan, and at
    # 100 TB this removes `iterations` full |E| shuffles — the dominant
    # cost of naive DataFrame PageRank. The out-degree aggregation
    # reuses the same partitioning for free.
    directed = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .persist()
    )
    # out-degree is FOLDED INTO THE RANK STATE (vertex, odeg, r) instead
    # of living in a separate table: the naive formulation joins od onto
    # the |E|-sized (directed ⋈ ranks) frame every iteration — an extra
    # edge-volume merge join per round, 5 per run. Carrying odeg through
    # the vertex-sized state costs 8 bytes/vertex and removes it
    # entirely; the per-round work drops to ONE edge-keyed join + one
    # vertex-keyed left join. (Sum-order inside the dst aggregation is
    # engine-internal either way — the 6dp rounding after each damped
    # update is what puts both engines on the shared lattice.)
    verts_od = (
        directed.groupBy(F.col("src").alias("vertex"))
        .agg(F.count(F.lit(1)).alias("odeg"))
        .persist()
    )
    n_row = verts_od.agg(F.count(F.lit(1)).alias("n"))
    ranks = verts_od.crossJoin(F.broadcast(n_row)).select(
        "vertex", "odeg", F.round(F.lit(1.0) / F.col("n"), 6).alias("r")
    )
    d = float(damping)
    for _ in range(iterations):
        contrib = (
            directed.join(
                ranks.select(
                    F.col("vertex").alias("src"), "odeg", "r"
                ).hint("merge"),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("odeg")).alias("s"))
        )
        ranks = (
            verts_od.join(
                contrib.select(F.col("dst").alias("vertex"), "s").hint("merge"),
                "vertex",
                "left",
            )
            .crossJoin(F.broadcast(n_row))
            .select(
                "vertex",
                "odeg",
                F.round(
                    F.lit(1.0 - d) / F.col("n")
                    + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0)),
                    6,
                ).alias("r"),
            )
        )
    return ranks.select("vertex", F.col("r").alias("pagerank"))


def label_propagation(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007; the GraphFrames/Pregel LPA everybody actually runs) —
    the third member of the bulk-iterative graph family beside
    ``pagerank`` and the CC star contractions (operators/dedup.py:190).

    Input: ``(u, v)`` distinct undirected edges with ``u < v``. Every
    vertex starts labeled with its own id; each round, every vertex
    adopts the MOST FREQUENT label among its neighbors, ties broken by
    the smallest label — a fully deterministic integer-only update, so a
    DuckDB oracle replays every round CTE by CTE with zero float risk
    (no lattice rounding even needed). Fixed ``iterations`` rounds, the
    bounded-iteration convention of pagerank/k-means (synchronous LPA
    can oscillate on bipartite structures — a fixpoint loop would not
    terminate, and bounded rounds are what Pregel deployments run).

    Scale shape:
    - Each round is ONE edge-keyed equi-join (labels ⋈ edges on src) +
      a groupBy(dst, label) vote count + a per-dst min(struct) argmax —
      both aggregations map-side-combinable, never a global sort.
    - The both-direction edge list is shuffled ONCE to
      hash-partitioning(src) and persisted; every round's merge join
      streams it from cache with Exchange and Sort elided, shuffling
      only the vertex-sized label frame (the pagerank partitioning-reuse
      trick; same documented cache lifetime as the other graph ops).
    - Label frames grow with the graph → merge-hinted joins (r6 rule).
    - Lineage is linear in rounds (labels has one consumer per round);
      votes fan in via map-side partial counts, and AQE handles hub
      skew on dst.
    """
    directed = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .persist()
    )
    labels = (
        directed.select(F.col("src").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("label"))
    )
    for _ in range(iterations):
        votes = (
            directed.join(
                labels.select(F.col("vertex").alias("src"), "label").hint("merge"),
                "src",
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # r17: per-dst argmax as a map-side-combinable min(struct)
        # aggregation — min over (-c, label) struct order ≡ the old
        # row_number window's (c DESC, label ASC) pick exactly (integer
        # negation is exact; (dst, label) vote rows are unique so no
        # further tie exists). The window form sorted the vote stream
        # twice per round (WindowGroupLimit partial + final both require
        # sorted input); the aggregate form is two hash passes.
        labels = (
            votes.groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("p")
            )
            .select(
                F.col("dst").alias("vertex"), F.col("p.label").alias("label")
            )
        )
    return labels


def kcore_peel(edges: DataFrame, k: int = 10, rounds: int = 4) -> DataFrame:
    """Bounded-round k-core peeling (Seidman 1983 cores; the standard
    iterative-peeling formulation every BSP graph system ships): each
    round drops every vertex whose CURRENT degree is < ``k`` and keeps
    only edges with both endpoints surviving; after ``rounds`` rounds,
    return the surviving vertices with their residual degrees. Bounded
    rounds (not run-to-fixpoint) is the pagerank/LPA convention — the
    state after round r is deterministic, so a DuckDB oracle replays
    every peel exactly; the update is integer-only (degree counts +
    semi-join membership), zero float surface.

    Scale shape:
    - Each round is one explode + map-side-partial degree count and two
      LEFT SEMI joins of the edge list against the surviving-vertex set
      (merge-hinted: both frames grow with the graph, and the survivor
      set is post-aggregation — static estimates untrustworthy, r6 rule).
    - The edge frame has TWO consumers per round (the degree count and
      the next round's filter), so it is localCheckpoint-ed each round —
      the CLAUDE.md iterative-state rule; without the pin the lineage
      doubles per round and round 4 replays the peel chain 2⁴ times.
      The materialized frame SHRINKS every round (peeling is monotone),
      so the checkpoint cost is bounded by the first round's edge count.
    """
    e = edges.select("u", "v")
    for _ in range(rounds):
        e = e.localCheckpoint(eager=True)
        deg = (
            e.select(F.explode(F.array("u", "v")).alias("x"))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        keep = deg.filter(F.col("dg") >= k).select("x")
        e = e.join(
            keep.select(F.col("x").alias("u")).hint("merge"), "u", "left_semi"
        ).join(
            keep.select(F.col("x").alias("v")).hint("merge"), "v", "left_semi"
        )
    e = e.localCheckpoint(eager=True)
    return (
        e.select(F.explode(F.array("u", "v")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def link_prediction(
    edges: DataFrame,
    min_cn: int = 2,
    k: int = 100,
    degree_cap: int | None = None,
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction (Liben-Nowell &
    Kleinberg 2003) over distinct undirected ``(u, v)`` edges with
    ``u < v``: score NON-adjacent pairs by |Γ(u)∩Γ(v)| and Jaccard,
    top-``k`` under the (jaccard desc, u, v) total order.

    Wedge volume is Σ deg(w)² — inherent to common-neighbor enumeration
    (every wedge matters, so the triangle orientation trick cannot
    prune). ``degree_cap`` makes the standard production mitigation a
    REAL parameter (VERDICT r7 next-round #6): each wedge CENTER keeps
    only its first ``degree_cap`` neighbors in the deterministic
    ``dst``-ascending order before wedge generation, bounding per-vertex
    wedge fan-out at cap² no matter how fat the power-law head is.
    Properties:
    - result-INVARIANT when every degree ≤ cap (the row_number filter
      keeps everything; proven by test on the co-purchase graph);
    - with the cap active, ``common_neighbors`` becomes a lower bound
      computed on the truncated adjacency, while the Jaccard denominator
      still uses TRUE degrees — scores for surviving pairs degrade
      gracefully instead of the job dying on the hub.
    - the neighbor ranking window is partitioned by vertex (never a
      global window), and every corpus-growing join is merge-hinted
      (r6 broadcast-estimate rule).
    """
    from pyspark.sql import Window

    edges = edges.select("u", "v")
    directed = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("dg"))
    adj = directed
    if degree_cap is not None:
        w = Window.partitionBy("src").orderBy("dst")
        adj = (
            directed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= degree_cap)
            .drop("rn")
        )
    a = adj.select("src", F.col("dst").alias("u"))
    b = adj.select("src", F.col("dst").alias("v"))
    wedges = (
        a.join(b.hint("merge"), "src")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= min_cn)
    )
    cand = wedges.join(edges.hint("merge"), ["u", "v"], "left_anti")
    du = deg.select(F.col("src").alias("u"), F.col("dg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("dg").alias("dv"))
    return (
        cand.join(du.hint("merge"), "u")
        .join(dv.hint("merge"), "v")
        .select(
            "u",
            "v",
            F.col("cn").alias("common_neighbors"),
            F.round(
                F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(k)
    )


def bfs_distances(
    edges: DataFrame, sources: DataFrame, rounds: int = 4
) -> DataFrame:
    """Bounded-round multi-source BFS over distinct undirected ``(u, v)``
    edges: hop distance from the nearest source (the landmark-distance
    primitive under routing features, graph embeddings, and
    closeness-centrality estimates). Bounded rounds, not run-to-fixpoint
    — the pagerank/LPA/k-core convention, so the state after round r is
    deterministic and a DuckDB oracle replays every relaxation exactly;
    integer-only updates, zero float surface.

    Scale shape: per round, one equi-join of the CURRENT distance frame
    against the directed edge list (both grow with the graph —
    merge-hinted, r6 rule) and one min-groupBy with map-side partials.
    State is (vertex, dist) for REACHED vertices only; localCheckpoint
    per round (two consumers: the join and the union — iterative-state
    rule). Unreached vertices never enter the state, so the frame is
    frontier-bounded, not graph-bounded, in the early rounds."""
    directed = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    state = sources.select(
        F.col(sources.columns[0]).alias("vertex"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            state.join(
                directed.hint("merge"),
                state["vertex"] == directed["src"],
            )
            .select(F.col("dst").alias("vertex"), (F.col("dist") + 1).alias("dist"))
        )
        state = (
            state.unionByName(relaxed)
            .groupBy("vertex")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return state.select("vertex", F.col("dist").cast("long").alias("dist"))


def hits(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over a DIRECTED
    edge list ``(src, dst)`` — the mutual-reinforcement twin of
    :func:`pagerank` for bipartite endorsement graphs (here:
    customer→part purchases; hubs = broad buyers, authorities =
    widely-bought parts).

    Power method with DEFERRED normalization: HITS' per-iteration L1
    normalization only rescales (the direction is what converges), so
    the iteration runs UNNORMALIZED on exact integers — h₀ = 1, then
    ``a(v) = Σ_{(u,v)} h(u)`` and ``h(u) = Σ_{(u,v)} a(v)`` are integer
    sums with no float lattice anywhere — and the L1 quotient is taken
    ONCE at the end, 6dp-rounded (the only inexact step, same
    convention as pagerank). Exactness bound: raw scores grow like
    ``(d_in·d_out)^T``; with T=4 this stays below 2⁵³ for degree
    products up to ~2000, far above the thresholded purchase graph at
    any tested SF — a graph beyond that needs the per-round-normalized
    variant (power-of-two rescaling keeps it exact), not this one.

    Scale shape (why deferred normalization matters at 100 TB):
    - Per-round normalization gives every state TWO consumers (the norm
      aggregate and the next join) → per-round localCheckpoints, 4
      driver-sync jobs per round. Deferred, the lineage is LINEAR like
      pagerank's — zero materializations inside the loop, the whole
      2T-join chain is one codegen'd pipeline.
    - The edge list is persisted TWICE, pre-partitioned on src and on
      dst — the iteration alternates join keys, so each half-round is a
      merge join against the matching copy with its Exchange elided
      (the pagerank partitioning-reuse trick, one copy per key);
      nothing larger than |E| materializes, map-side partials on both
      aggregations.
    - The finished integer states are localCheckpoint-ed ONCE (they
      feed both their norm aggregate and the output projection), the
      1-row norms broadcast, and vertex/edge-sized sides never do (the
      r6 static-planner-estimate rule).

    Returns ``(vertex, role, score)`` with role ∈ {'hub', 'authority'}.
    """
    by_src = (
        edges.select("src", "dst")
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .persist()
    )
    by_dst = (
        edges.select("src", "dst")
        .repartition(F.col("dst"))
        .sortWithinPartitions("dst")
        .persist()
    )
    h = by_src.select(F.col("src").alias("vertex")).distinct().select(
        "vertex", F.lit(1).cast("long").alias("score")
    )
    a = None
    for i in range(iterations):
        a = (
            by_dst.join(
                h.select(F.col("vertex").alias("src"), "score").hint("merge"),
                "src",
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("score").alias("score"))
        )
        if i == iterations - 1:
            # checkpoint a BEFORE the final h half-round so the whole
            # 2T-join chain executes once (h's checkpoint job reads a's)
            a = a.localCheckpoint(eager=True)
        h = (
            by_src.join(
                a.select(F.col("vertex").alias("dst"), "score").hint("merge"),
                "dst",
            )
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("score").alias("score"))
        )
    h = h.localCheckpoint(eager=True)

    def _normed(state: DataFrame, role: str) -> DataFrame:
        # the norm SUMS the per-vertex scores, so it overflows BIGINT a
        # vertex-count factor before the scores themselves do (caught by
        # the 10x growing-hub probe: 40 hubs x 3.9e17 > 2^63) — sum in
        # DECIMAL(38,0) (exact; DuckDB's sum(BIGINT) is HUGEINT) and
        # take the quotient in double (deterministic IEEE rounding of
        # the same exact integers on both engines)
        nrm = state.agg(
            F.sum(F.col("score").cast("decimal(38,0)")).alias("nrm")
        )
        return state.crossJoin(F.broadcast(nrm)).select(
            "vertex",
            F.lit(role).alias("role"),
            F.round(
                F.col("score").cast("double") / F.col("nrm").cast("double"), 6
            ).alias("score"),
        )

    return _normed(h, "hub").unionByName(_normed(a, "authority"))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002, "Assortative
    mixing in networks"): the Pearson correlation of endpoint degrees
    over every DIRECTED edge of the undirected graph — positive when
    hubs attach to hubs, negative for hub-and-spoke topologies. A
    training-data-pipeline health metric for co-occurrence graphs
    (a near-complete or star-shaped dedup graph behaves pathologically
    downstream; assortativity is the one-number screen).

    Input: ``(u, v)`` distinct undirected edges, u < v. Output: one row
    ``(m_directed, n_vertices, assortativity)``.

    Exactness: degrees are BIGINT; every cross-row moment (Σxy, Σx²,
    Σy², Σx, Σy) is summed in DECIMAL(38,0) per the graph_hits /
    neyman-allocation overflow convention (deg ≤ 1e6 ⇒ per-edge
    products ≤ 1e12; 38 digits carries ~1e26 directed edges). The
    Pearson numerator/denominators are formed in DECIMAL — exact, no
    cancellation — and only the final divide + sqrt are IEEE ops on
    identical expression trees, then 6dp-rounded.

    Scale shape: one explode + groupBy for degrees, two merge-hinted
    equi-joins to annotate endpoints (degree table grows with the
    graph — never broadcast, the r6 rule), one global aggregate.
    """
    d = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = d.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    x = deg.select(F.col("src"), F.col("deg").alias("x"))
    y = deg.select(F.col("src").alias("dst"), F.col("deg").alias("y"))
    ann = d.join(x.hint("merge"), "src").join(y.hint("merge"), "dst")
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = ann.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("decimal(38,0)").alias("syy"),
    )
    nv = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    md = F.col("m").cast("decimal(38,0)")
    num = (md * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
    dx = (md * F.col("sxx") - dec("sx") * dec("sx")).cast("double")
    dy = (md * F.col("syy") - dec("sy") * dec("sy")).cast("double")
    return s.crossJoin(F.broadcast(nv)).select(
        F.col("m").alias("m_directed"),
        "n_vertices",
        F.round(num / F.sqrt(dx * dy), 6).alias("assortativity"),
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient: lcc(v) = 2·tri(v) /
    (deg(v)·(deg(v)−1)) for deg ≥ 2 (Watts–Strogatz 1998). Rides the
    degree-ordered ``triangle_counts`` wedge join (same O(m^1.5)
    skew bound), then one merge-hinted left join to attach triangle
    counts to the degree table — triangle-free vertices keep 0.

    Output: ``(vertex, degree, n_triangles, lcc)`` for every vertex
    with degree ≥ 2; integer-exact until the single final division.
    """
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(edges)
    out = (
        deg.filter(F.col("degree") >= 2)
        .join(tri.hint("merge"), "vertex", "left")
        .select(
            "vertex",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        )
    )
    return out.select(
        "vertex",
        "degree",
        "n_triangles",
        F.round(
            (2.0 * F.col("n_triangles").cast("double"))
            / (
                F.col("degree").cast("double")
                * (F.col("degree") - 1).cast("double")
            ),
            6,
        ).alias("lcc"),
    )
