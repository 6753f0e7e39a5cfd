"""Single-pass column profiler (data-quality summary, Deequ-style).

Beyond the reference's surface: the reference eyeballs its inputs with
ad-hoc pandas ``describe``/``value_counts`` calls (QC_Functions.py's
tally helpers are the closest analog); a 100 TB pipeline needs one
distributed pass that profiles EVERY column — null counts, exact or
approximate cardinality, numeric ranges and means, lexical ranges —
and emits a small long-format table a curator (or a schema-drift
monitor) can diff between snapshots.

Design for 100 TB:
- ONE ``df.agg`` computes every statistic for every column in a single
  scan; partial aggregation is map-side-combinable, so the shuffle is
  one row of scalars per partition.
- The wide→long reshape happens AFTER aggregation, on a one-row frame —
  ``explode`` over an array of per-column structs, driver-sized.
- ``exact_distinct=True`` uses ``count(DISTINCT col)``; Spark plans k
  distinct aggregates via Expand (k× the scan rows pre-combine), which
  is honest but heavy at extreme scale — flip to
  ``exact_distinct=False`` for one-pass HyperLogLog
  (``approx_count_distinct``) with no Expand. The driver-gated query
  uses exact so the DuckDB oracle can replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile columns in one distributed pass.

    Output (one row per profiled column):
    ``col_name, n_rows, n_nulls, n_distinct, min_num, max_num, avg_num,
    min_str, max_str`` — the ``*_num`` fields are NULL for string
    columns and vice versa; numeric stats are doubles rounded to 6.
    """
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for c in numeric_cols + string_cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__cnt_{c}"))
        aggs.append(distinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
    for c in numeric_cols:
        d = F.col(c).cast("double")
        aggs.append(F.round(F.min(d), 6).alias(f"__min_{c}"))
        aggs.append(F.round(F.max(d), 6).alias(f"__max_{c}"))
        aggs.append(F.round(F.avg(d), 6).alias(f"__avg_{c}"))
    for c in string_cols:
        s = F.col(c).cast("string")
        aggs.append(F.min(s).alias(f"__smin_{c}"))
        aggs.append(F.max(s).alias(f"__smax_{c}"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in numeric_cols + string_cols:
        is_num = c in numeric_cols
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else null_d).alias("max_num"),
                (F.col(f"__avg_{c}") if is_num else null_d).alias("avg_num"),
                (null_s if is_num else F.col(f"__smin_{c}")).alias("min_str"),
                (null_s if is_num else F.col(f"__smax_{c}")).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def numeric_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Distribution-drift monitor between two cohorts of one column: the
    Population Stability Index (PSI), the standard model/data-drift
    metric, over equal-width bins.

    ``group_col`` must be an int column with values 0 (baseline cohort)
    and 1 (comparison cohort). Output, one row per occupied bin:
    ``bin, n_a, n_b, share_a, share_b, psi_term`` where shares are
    Laplace-smoothed (``+smoothing`` per bin, so empty-on-one-side bins
    contribute a finite term) and ``psi_term =
    (share_a − share_b)·ln(share_a / share_b)``; total PSI = Σ terms
    (< 0.1 stable, > 0.25 drifted, by the usual rule of thumb).

    Design for 100 TB:
    - Two passes over the column, both fully map-side-combinable: one
      min/max aggregate for the bin edges, one binned conditional-count
      aggregate. The grand totals come from an unpartitioned window over
      the ``n_bins``-row count frame — the sanctioned aggregate-sized
      pattern (a totals JOIN would duplicate the whole counts subtree in
      the plan and re-scan the column twice more).
    - The bin-edge frame is ONE ROW — it broadcasts legitimately (an
      architectural constant, not corpus-growing).
    - Expression order inside the bin arithmetic matches the DuckDB
      oracle token-for-token so the IEEE results are bit-identical.
    """
    v = F.col(value_col).cast("double")
    base = df.select(v.alias("v"), F.col(group_col).alias("grp")).filter(
        F.col("v").isNotNull()
    )
    bounds = base.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    nb = F.lit(float(n_bins))
    bin_expr = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / nb)),
            F.lit(n_bins - 1).cast("long"),
        )
    )
    counts = (
        base.join(F.broadcast(bounds))
        .select(bin_expr.alias("bin"), "grp")
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        )
    )
    from pyspark.sql import Window

    whole = Window.partitionBy()
    counts = counts.withColumn("ta", F.sum("n_a").over(whole)).withColumn(
        "tb", F.sum("n_b").over(whole)
    )
    s = F.lit(float(smoothing))
    sm_total = F.lit(float(smoothing) * n_bins)
    share_a = (F.col("n_a") + s) / (F.col("ta") + sm_total)
    share_b = (F.col("n_b") + s) / (F.col("tb") + sm_total)
    return counts.select(
        "bin",
        "n_a",
        "n_b",
        F.round(share_a, 6).alias("share_a"),
        F.round(share_b, 6).alias("share_b"),
        F.round((share_a - share_b) * F.log(share_a / share_b), 6).alias("psi_term"),
    )
