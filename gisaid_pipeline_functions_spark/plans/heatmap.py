"""K5 — styled Excel heatmap sink (reference Time_Series.py:813–837).

Presentation, not engine: the reference collects the percentage pivot into
pandas and writes a ``Styler.background_gradient`` .xlsx. Same here — the
pivot is computed distributed, only the (small) wide table collects to the
driver. openpyxl is not in this container, so the writer degrades to CSV
with a warning instead of failing the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gradient_shades(
    pct_long: DataFrame,
    key_col: str = "key",
    value_col: str = "pct",
    buckets: int = 4,
) -> DataFrame:
    """The heatmap's DATA contract (the part of K5 that is engine, not
    paint): per-column min–max normalization exactly as
    ``Styler.background_gradient(subset=value_cols)`` computes it, folded
    to ``buckets`` discrete shade labels ``q0..q{buckets-1}``. Runs on the
    LONG percentage table (one window per key column, partitioned — the
    wide pivot stays a sink-side step); a constant column (max == min)
    shades q0."""
    w = Window.partitionBy(key_col)
    lo, hi = F.min(value_col).over(w), F.max(value_col).over(w)
    bucket = F.when(hi == lo, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - lo) * buckets / (hi - lo)).cast("int"),
            F.lit(buckets - 1),
        )
    )
    return pct_long.withColumn(
        "shade", F.concat(F.lit("q"), bucket.cast("string"))
    )


def write_heatmap_xlsx(wide_pivot: DataFrame, path: str, cmap: str = "Reds") -> str:
    """Collect the (sink-side, already-pivoted) table and write a styled
    .xlsx; falls back to ``<path>.csv`` when openpyxl is unavailable.
    Returns the path actually written."""
    pdf = wide_pivot.toPandas()
    value_cols = [c for c in pdf.columns if c != pdf.columns[0]]
    try:
        import openpyxl  # noqa: F401

        styler = pdf.style.background_gradient(cmap=cmap, subset=value_cols)
        styler.to_excel(path, index=False)
        return path
    except ImportError:
        fallback = path.rsplit(".", 1)[0] + ".csv"
        pdf.to_csv(fallback, index=False)
        return fallback
