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

Hashing is md5-prefix via ``conv(hex, 16, 10)`` — the same first-8
hex digits as ``hex_uniform_u32`` (operators/training.py) but a single
codegen ``conv`` instead of its 8-term positional decode (see
``_cms_cell``) — so a DuckDB oracle replays the EXACT counter grid; the
driver gate is a full value hash, not just a bounded-error contract.
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
    # LEFT join + coalesce-0: the grid stores only touched cells, so a
    # key absent from the build stream probes missing cells — those are
    # ZERO counters (est 0), not rows to drop (an inner join would take
    # the min over the surviving cells only and overestimate absentees)
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est"))
    )


def bloom_build(
    keys: DataFrame, key_col: str = "key", n_bits: int = 4096, n_hashes: int = 3
) -> DataFrame:
    """Build a Bloom filter over a key set as DATA: a single row holding a
    dense ``n_bits/64``-element long array. (Spark's own
    ``bloom_filter_agg`` is optimizer-internal, not a public function —
    this is the same structure built from public primitives.)

    Each key sets ``n_hashes`` bits (md5-positional hashing, DuckDB-
    replayable); per-word ``bit_or`` collapses map-side exactly like the
    count-min grid — the shuffle carries ≤ words × partitions partial
    rows, the result is CONSTANT-size regardless of key count, and two
    filters over key shards merge by element-wise OR."""
    n_words = (n_bits + 63) // 64
    rows = F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("i")
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("_k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_bits
    )
    cells = (
        keys.select(F.col(key_col).alias("_k"))
        .select(rows, F.col("_k"))
        .select(pos.alias("p"))
        # shiftleft needs a column shift count -> SQL form
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
    )
    words = cells.groupBy("w").agg(F.bit_or("m").alias("bits"))
    # densify to a fixed array (index = word) so membership is one
    # element_at per probe — a single broadcastable row
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda w: F.coalesce(F.element_at("_m", w), F.lit(0).cast("long")),
        ).alias("bloom")
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Filter ``df`` to rows whose key MIGHT be in the filter — the
    semi-join reduction that drops fact rows BEFORE the join shuffle.
    The one-row bitset crossJoins in broadcast; the membership test is a
    pure map-side expression (``n_hashes`` element_at + bit tests), so
    the pre-filter adds zero shuffles. No false negatives by
    construction: every true match survives, and the exact join after
    the filter removes the false positives.

    Internal columns use a ``__bloom…__`` namespace so a caller frame
    that happens to carry ``bloom`` or ``_p0`` is not clobbered (ADVICE
    r5); the namespace itself is asserted free."""
    reserved = {"__bloom_bits__"} | {f"__bloom_p{i}__" for i in range(n_hashes)}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with bloom internals: {sorted(clash)}")

    def pos_expr(i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(str(i)), F.lit(":"), F.col(key_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_bits
        )

    probed = df.crossJoin(
        F.broadcast(bloom.select(F.col("bloom").alias("__bloom_bits__")))
    )
    cond = F.lit(True)
    for i in range(n_hashes):
        probed = probed.withColumn(f"__bloom_p{i}__", pos_expr(i))
        word = F.element_at(
            "__bloom_bits__", ((F.col(f"__bloom_p{i}__") / 64).cast("int") + 1)
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__bloom_p{i}__ % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return probed.filter(cond).drop(
        "__bloom_bits__", *[f"__bloom_p{i}__" for i in range(n_hashes)]
    )


def kmv_sketch(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """KMV distinct-value synopsis (Beyer et al., SIGMOD 2007 "On
    synopses for distinct-value estimation under multiset operations"):
    the ``k`` MINIMUM u32 hash values of the column's distinct keys —
    the third mergeable sketch beside count-min (frequency) and HLL
    (plain distinct), and the one that supports SET OPERATIONS: union /
    intersection / Jaccard estimates compose from the per-set sketches
    alone, no re-scan.

    Hashing is the same md5-prefix ``conv(hex,16,10)`` u32 as the CMS
    grid, so a DuckDB oracle replays the sketch VALUES bit-identically.
    Plan shape: distinct-hash aggregation (shuffles distinct keys, the
    one unavoidable pass) then ``orderBy(hv).limit(k)`` — a
    TakeOrderedAndProject whose per-partition heaps keep ≤ k values
    each; the driver merge receives partitions × k values, constant in
    corpus size."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.select(h.alias("hv")).distinct().orderBy("hv").limit(k)


def kmv_set_estimates(
    df_a: DataFrame, df_b: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """Distinct / union / intersection / Jaccard estimates for two key
    sets from their KMV sketches (one output row). The union sketch is
    the k smallest of the two sketches' union (closure under union is
    the KMV selling point); the estimators are the paper's:
    ``D ≈ (k-1) / θ`` with ``θ = (kth_min + 1) / 2³²`` when the sketch
    is full, the EXACT sample size when not (a sketch with < k values
    IS the distinct hash set); Jaccard is the fraction of union-sketch
    values present in both per-set sketches, and the intersection
    estimate is ``Jaccard × D_union``. Every input to the float math is
    an integer, and both engines evaluate the same expression tree —
    value-hash parity, not a bounded-error contract.

    The per-set sketches are tiny (≤ k rows) but each feeds THREE
    consumers (own stats, the union sketch, the membership probe), and
    an unpinned sketch would re-run its corpus distinct+top-k per
    consumer — so they are persisted (the r6 diamond rule; same
    documented cache lifetime as the other persist-under-lazy
    operators)."""
    sa = kmv_sketch(df_a, key_col, k).persist()
    sb = kmv_sketch(df_b, key_col, k).persist()
    m = sa.unionByName(sb).distinct().orderBy("hv").limit(k).persist()

    def stats(s: DataFrame, n_name: str, kth_name: str) -> DataFrame:
        return s.agg(
            F.count(F.lit(1)).alias(n_name), F.max("hv").alias(kth_name)
        )

    def est(n, kth):
        return F.when(n < k, n.cast("double")).otherwise(
            F.lit(float((k - 1) * 2**32)) / (kth + F.lit(1.0))
        )

    both = (
        m.join(sa, "hv", "left_semi")
        .join(sb, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    row = (
        stats(sa, "n_a", "kth_a")
        .crossJoin(stats(sb, "n_b", "kth_b"))
        .crossJoin(stats(m, "n_union", "kth_u"))
        .crossJoin(both)
    )
    est_u = est(F.col("n_union"), F.col("kth_u"))
    jacc = F.col("n_both") / F.col("n_union")
    return row.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_union").cast("long").alias("n_union"),
        F.col("n_both").cast("long").alias("n_both"),
        F.round(est(F.col("n_a"), F.col("kth_a")), 6).alias("est_a"),
        F.round(est(F.col("n_b"), F.col("kth_b")), 6).alias("est_b"),
        F.round(est_u, 6).alias("est_union"),
        F.round(jacc, 6).alias("jaccard"),
        F.round(jacc * est_u, 6).alias("est_intersection"),
    )
