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
