"""Skew-aware join utilities (SURVEY §4; 100 TB design).

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.get_spark`), which splits oversized shuffle partitions at
runtime. Salting is the explicit fallback for the pathological case AQE
can't fix: a *single* join key (a hot protein, a mega-cluster) holding a
double-digit share of the rows.

``salted_join`` replicates the SMALL side R ways and scatters the large
side's hot keys across R salt buckets — (key, salt) becomes the shuffle
key, so one hot key spreads over R reducers. Results are identical to the
plain join (tested), cost is R× the small side's shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with the large side's
    rows scattered across ``salt_buckets`` salts.

    The small side is exploded ``salt_buckets``× (every key × every salt)
    — only viable when small is genuinely small; that's the same regime
    where broadcast would also work, but salting keeps a shuffle join
    viable when the small side exceeds the broadcast threshold yet single
    keys still dominate."""
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return (
        salted_large.join(salted_small, [on, "_salt"], how)
        .drop("_salt")
    )


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row share of the table — the number you look at
    before deciding plain AQE vs salting."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.round(F.col("n") / total, 6))
        .orderBy(F.desc("n"))
        .limit(top)
    )
