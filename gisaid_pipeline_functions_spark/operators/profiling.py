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
