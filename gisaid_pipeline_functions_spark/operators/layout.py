"""Data-layout operators for scan pruning at scale (beyond-reference;
the 100 TB lever behind Delta/Iceberg ``OPTIMIZE ZORDER``): multi-
dimensional clustering via Morton (Z-order) interleaving, so per-file
min/max statistics stay TIGHT in every clustered dimension and a
predicate on ANY of them can skip most of the data.

A linear sort clusters one column perfectly and leaves every other
column's per-file range at full width — a filter on the second column
reads everything. Interleaving the bits of both columns makes each
contiguous Z-range an axis-aligned block of the value space, so both
columns' ranges shrink like sqrt(files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton code of two non-negative ints (bit interleaving, y in the
    odd positions): a pure 2·bits-term integer expression — well inside
    codegen and far below the generated-Add-chain regime (SCALING.md:
    that starts at hundreds of terms). Identical integer arithmetic
    exists in DuckDB, so oracles replay codes exactly."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
        )
    return z


def bucket_stats(
    pts: DataFrame, bucket: Column, x: str = "x", y: str = "y"
) -> DataFrame:
    """Per-bucket min/max/count of both dimensions — exactly the footer
    statistics a parquet file written from that bucket would carry, so
    counting buckets whose [min, max] ranges intersect a predicate box
    IS the file-skipping computation a reader performs, minus the I/O."""
    return pts.groupBy(bucket.alias("b")).agg(
        F.min(x).alias("min_x"),
        F.max(x).alias("max_x"),
        F.min(y).alias("min_y"),
        F.max(y).alias("max_y"),
        F.count(F.lit(1)).alias("n"),
    )
