"""Plot-preparation pipeline (SURVEY §3.3): the data side of
Plotting_Functions.py — top-n selection, region annotation, display
labels, multi-protein stacking. The matplotlib sinks themselves are
driver-side presentation and out of engine scope (SURVEY K7); everything
up to the final small pivot is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.joins import annotate_ranges


def prepare_top_n(
    ts_long: DataFrame,
    n: int = 10,
    by: str = "frequency",
    key_col: str = "key",
    freq_col: str = "freq",
    total_col: str | None = None,
) -> DataFrame:
    """Top-n keys with rank, by total frequency or by prevalence
    (frequency normalized by the per-key total, Plotting_Functions.py:
    568–734). Rank is materialized — the reference preserves top-k order
    through downstream reindexing (O4, :644)."""
    if by == "frequency":
        scored = ts_long.groupBy(key_col).agg(F.sum(freq_col).alias("score"))
    elif by == "prevalence":
        if total_col is None:
            raise ValueError("prevalence ranking needs total_col")
        scored = (
            ts_long.groupBy(key_col)
            .agg(F.sum(freq_col).alias("f"), F.sum(total_col).alias("t"))
            .select(
                key_col,
                F.when(F.col("t") == 0, 0.0)
                .otherwise(F.col("f") / F.col("t"))
                .alias("score"),
            )
        )
    else:
        raise ValueError(f"unknown ranking {by!r}")
    w = Window.orderBy(F.desc("score"), F.asc(key_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
    )


def subset_to_top_n(ts_long: DataFrame, top: DataFrame, key_col: str = "key") -> DataFrame:
    """F6 + reindex: keep only top-n keys, carrying their rank so sinks
    can preserve the top-k ordering (broadcast semi-ish join)."""
    return ts_long.join(
        F.broadcast(top.select(key_col, "rank")), key_col
    )


def annotate_positions_with_regions(
    ts: DataFrame, regions: DataFrame, position_col: str = "position"
) -> DataFrame:
    """J6 over plot data: label each code's reference position with its
    protein region, 'Other' when uncovered (Plotting_Functions.py:76–169)."""
    return annotate_ranges(ts, position_col, regions)


def display_labels(
    ts: DataFrame,
    protein_col: str = "protein",
    code_col: str = "key",
    region_col: str = "region_name",
) -> DataFrame:
    """P7 — "<protein>: <code> (<region>)" labels
    (Plotting_Functions.py:247–298)."""
    return ts.withColumn(
        "label",
        F.format_string(
            "%s: %s (%s)", F.col(protein_col), F.col(code_col), F.col(region_col)
        ),
    )


def stack_proteins(per_protein: list[DataFrame]) -> DataFrame:
    """U1 — vertical concat of per-protein TS tables with missing columns
    allowed (Plotting_Functions.py:339–386)."""
    out = per_protein[0]
    for df in per_protein[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
