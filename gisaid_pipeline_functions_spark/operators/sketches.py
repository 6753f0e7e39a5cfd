"""Mergeable frequency sketches (beyond-reference; BASELINE.json north
star): count-min over arbitrary key streams.

Why a sketch at 100 TB: exact per-key counts of a heavy-tailed key stream
(words, URLs, user ids) shuffle ``distinct keys`` rows; a count-min sketch
shuffles a CONSTANT ``depth × width`` counter grid no matter the corpus
size, the partials merge by cell-wise addition (safe under partial
aggregation, retries, and day→month rollups), and point estimates never
underestimate (Cormode & Muthukrishnan 2005, the min-of-d-counters
guarantee). Companion to the HLL rollup in queries/windows.py
(agg_hll_sketch_merge) — that one gates distinct counting, this one gates
frequency estimation.

Hashing is md5-positional (``hex_uniform_u32`` — operators/training.py)
so a DuckDB oracle replays the EXACT counter grid; the driver gate is a
full value hash, not just a bounded-error contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _cms_cell(row_idx, key_col, width: int):
    """Counter column for (row, key): first-8-hex-digit u32 of
    md5(row ':' key), mod width — identical digits on both engines.
    Decoded via ``conv(hex, 16, 10)`` (one codegen expression; the
    8-term positional decode of ``hex_uniform_u32`` costs ~8× here
    because the sketch hashes every key occurrence ``depth`` times)."""
    h = F.md5(F.concat(row_idx.cast("string"), F.lit(":"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(width).cast(
        "long"
    )


def cms_sketch(
    keys: DataFrame, key_col: str = "key", depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the count-min counter grid over a key stream (one input row
    = one occurrence). Returns ``(r, c, cnt)`` — ``depth × width`` rows.

    Plan shape: the key stream fans out ×depth map-side (explode of a
    literal row-index array), then ONE hash aggregation whose group count
    is the constant ``depth × width`` — partial aggregation collapses
    each input partition to ≤ depth × width partial rows before the
    shuffle, so the shuffle is O(partitions × grid), independent of
    corpus size."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    cells = keys.select(F.col(key_col).alias("_k")).select(
        rows, F.col("_k")
    )
    cells = cells.select(
        "r", _cms_cell(F.col("r"), F.col("_k"), width).alias("c")
    )
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_point_estimates(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate each query key against a built sketch:
    est(k) = min over rows r of counter[r, h_r(k)]. The sketch is
    grid-sized (constant), so it broadcasts; each query key fans out to
    its ``depth`` cells map-side and one min-agg per key finishes."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = queries.select(F.col(key_col), rows)
    probes = probes.select(
        key_col, "r", _cms_cell(F.col("r"), F.col(key_col), width).alias("c")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
