"""Sort / limit / top-k operators (SURVEY §2.8 O1–O6).

The reference's top-k is pandas sort+slice then reindex-to-order
(Plotting_Functions.py:626–644). Distributed top-k is
``orderBy(...).limit(n)`` — Spark plans it as TakeOrderedAndProject (a
per-partition heap + driver merge; no global sort shuffle). Deterministic
tie-breaks are mandatory for hash-stable results (SURVEY §7 risk list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """O4 — global top-k, caller supplies a total ordering."""
    return df.orderBy(*order_cols).limit(k)


def paginate(
    df: DataFrame, order_col: str, page_size: int, num_buckets: int | None = None
) -> DataFrame:
    """O6 — fixed-size row pages (Plotting_Functions.py:1059–1073):
    global row rank over the page ordering, ``floor((rank-1)/page_size)``.

    Scale-safe global ranking (an unpartitioned ``row_number`` window
    moves the WHOLE table to one partition — VERDICT r3 #3): the same
    block-prefix trick as the FASTA reader (sources/fasta.py:82) —
    1. one tiny stats pass collects ~B approximate range cut points,
       embedded as LITERALS so the bucketing is deterministic under
       recomputation (a ``repartitionByRange`` + ``spark_partition_id``
       variant would re-sample boundaries per branch);
    2. per-bucket row counts → prefix offsets via a triangular join over
       the B-row counts table (broadcast; no unpartitioned window);
    3. global rank = bucket prefix + partition-LOCAL ``row_number``
       (a partitioned window — each bucket ranks in parallel).

    Falls back to a single bucket for non-numeric order columns
    (approxQuantile is numeric-only); callers paginating big string-keyed
    tables should pre-map the key to a numeric rank.
    """
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    try:
        qs = [i / n for i in range(1, n)]
        cuts = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001))) if n > 1 else []
    except Exception:
        cuts = []  # non-numeric order column: degrade to one bucket
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(order_col) > F.lit(c)).cast("int")
    # NULL order keys: (NULL > cut) is NULL, so the raw bucket expression
    # is NULL and the _bkt equi-join below would silently DROP those rows
    # (the old unpartitioned row_number paginated them). Bucket -1 keeps
    # them and reproduces Spark's ASC NULLS FIRST: no bucket sorts below
    # -1, so its prefix is 0 and NULL rows rank first globally.
    parts = df.withColumn("_bkt", F.coalesce(bucket, F.lit(-1)))
    counts = parts.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    prefixes = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._bkt") < F.col("a._bkt"), "left")
        .groupBy(F.col("a._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_prefix"))
    )
    local_rn = F.row_number().over(Window.partitionBy("_bkt").orderBy(order_col))
    return (
        parts.join(F.broadcast(prefixes), "_bkt")
        .withColumn(
            "page",
            F.floor((F.col("_prefix") + local_rn - 1) / page_size).cast("int"),
        )
        .drop("_bkt", "_prefix")
    )


def global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    num_buckets: int | None = None,
) -> DataFrame:
    """Scale-safe GLOBAL row rank under the (order_col, tiebreak_col)
    total order — ``paginate``'s block-prefix trick (tiny literal cut
    points → per-bucket counts → broadcast triangular prefix →
    bucket-partitioned row_number + offset) exposed as a rank column,
    for consumers that need Σf(rank) aggregates (Gini, exact
    percentile-of-rank) rather than pages. An unpartitioned row_number
    window would move the whole table to one partition (VERDICT r3 #3).

    Ties on order_col land in one bucket (cuts compare strictly), so the
    tiebreak column totalizes the order deterministically."""
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    try:
        qs = [i / n for i in range(1, n)]
        cuts = (
            sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
            if n > 1
            else []
        )
    except Exception:
        cuts = []
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(order_col) > F.lit(c)).cast("int")
    parts = df.withColumn("_bkt", F.coalesce(bucket, F.lit(-1)))
    counts = parts.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    prefixes = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._bkt") < F.col("a._bkt"), "left")
        .groupBy(F.col("a._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_prefix"))
    )
    local_rn = F.row_number().over(
        Window.partitionBy("_bkt").orderBy(order_col, tiebreak_col)
    )
    return (
        parts.join(F.broadcast(prefixes), "_bkt")
        .withColumn("rank", (F.col("_prefix") + local_rn).cast("long"))
        .drop("_bkt", "_prefix")
    )


def block_cumsum(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Scale-safe GLOBAL running sum of ``value_cols`` under the
    ``order_col`` total order — ``global_rank``'s block-prefix trick
    (approx-quantile cut points → per-bucket totals → broadcast
    triangular prefix → bucket-partitioned window sum + offset)
    generalized from rank (count) to arbitrary sum columns, for ECDF /
    KS-statistic consumers. An unpartitioned running-sum window would
    move the whole table to one partition (the VERDICT r3 #3 rule).

    Adds ``cum_<col>`` (LongType) for each value column: the sum of
    that column over all rows ≤ the current row in the
    (order_col, tiebreak_col) order, INCLUDING the current row. Ties on
    order_col land in one bucket (cuts compare strictly); pass a
    tiebreak for a total order when order_col has duplicates, else the
    running sum at equal keys is frame-order-dependent.
    """
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    try:
        qs = [i / n for i in range(1, n)]
        cuts = (
            sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
            if n > 1
            else []
        )
    except Exception:
        cuts = []
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(order_col) > F.lit(c)).cast("int")
    parts = df.withColumn("_bkt", F.coalesce(bucket, F.lit(-1)))
    totals = parts.groupBy("_bkt").agg(
        *[F.sum(c).alias(f"_tot_{c}") for c in value_cols]
    )
    prefixes = (
        totals.alias("a")
        .join(totals.alias("b"), F.col("b._bkt") < F.col("a._bkt"), "left")
        .groupBy(F.col("a._bkt").alias("_bkt"))
        .agg(
            *[
                F.coalesce(F.sum(f"b._tot_{c}"), F.lit(0)).alias(f"_pre_{c}")
                for c in value_cols
            ]
        )
    )
    order = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    win = (
        Window.partitionBy("_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = parts.join(F.broadcast(prefixes), "_bkt")
    for c in value_cols:
        out = out.withColumn(
            f"cum_{c}",
            (F.col(f"_pre_{c}") + F.sum(c).over(win)).cast("long"),
        )
    return out.drop("_bkt", *[f"_pre_{c}" for c in value_cols])


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_buckets: int | None = None,
) -> DataFrame:
    """2-D skyline (Pareto frontier; Borzsony et al., ICDE 2001):
    rows not dominated by any other — maximize ``x_col``, minimize
    ``y_col``, dominance strict in at least one dimension (exact ties
    on both dims all survive). The 2-D case is sort-based, made
    scale-safe with the block-prefix trick of ``global_rank``:
    approx-quantile cuts bucket x, the per-bucket y-minima form a tiny
    broadcast triangular prefix (min over strictly-HIGHER buckets —
    bucket cuts compare strictly, so cross-bucket x order is strict),
    and within a bucket one PARTITIONED window over the distinct-x
    group rows finishes the running min. A row survives iff its y is
    the minimum of its x group AND strictly below every higher-x
    minimum. No global window, no all-pairs join."""
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    try:
        qs = [i / n for i in range(1, n)]
        cuts = (
            sorted(set(df.stat.approxQuantile(x_col, qs, 0.001)))
            if n > 1
            else []
        )
    except Exception:
        cuts = []
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(x_col) > F.lit(c)).cast("int")
    pts = df.withColumn("_bkt", bucket)
    grp = pts.groupBy("_bkt", x_col).agg(F.min(y_col).alias("_gy"))
    bmin = grp.groupBy("_bkt").agg(F.min("_gy").alias("_bmin"))
    hmin = (
        bmin.alias("a")
        .join(
            bmin.alias("b"), F.col("b._bkt") > F.col("a._bkt"), "left"
        )
        .groupBy(F.col("a._bkt").alias("_bkt"))
        .agg(F.min(F.col("b._bmin")).alias("_hmin"))
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # F.least skips NULLs (both engines), so the top bucket's first
    # x group — no higher-x point anywhere — gets NULL and survives
    frontier = (
        grp.join(F.broadcast(hmin), "_bkt")
        .withColumn(
            "_rmin",
            F.least(F.min("_gy").over(w), F.col("_hmin")),
        )
        .filter(F.col("_rmin").isNull() | (F.col("_gy") < F.col("_rmin")))
        .select("_bkt", x_col, "_gy")
    )
    return (
        pts.join(frontier, ["_bkt", x_col])
        .filter(F.col(y_col) == F.col("_gy"))
        .drop("_bkt", "_gy")
    )
