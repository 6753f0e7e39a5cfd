"""Training-data pipeline query registrations (beyond-reference):
deterministic sampling, paragraph-level dedup, and sequence packing over
the ``documents`` table, each with a DuckDB oracle (the packing oracle is
a recursive CTE replaying the same next-fit walk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.training import (
    chunk_text,
    pack_next_fit,
    rate_to_hex_threshold,
    stratified_sample,
)
from ..operators.training import sample_k_per_group as _sample_k_per_group
from ..registry import register
from ..sources.tables import load_table

# per-stratum rates: keep half of 'en' docs, a quarter of everything else
_EN_T = rate_to_hex_threshold(0.5)
_OTHER_T = rate_to_hex_threshold(0.25)

_CHUNK_WORDS = 10
_PACK_BUDGET = 50


@register(
    "sample_stratified",
    # Deterministic stratified Bernoulli sample: md5-prefix draw per doc,
    # per-language threshold. Reproducible under retries/partitioning —
    # the property df.sample lacks.
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE WHEN lang = 'en' THEN '{_EN_T}' ELSE '{_OTHER_T}' END
    """,
)
def sample_stratified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit(_EN_T)).otherwise(
        F.lit(_OTHER_T)
    )
    return stratified_sample(docs, "doc_id", threshold).select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_k_per_group",
    # Exact k-per-group by hash order — deterministic per-group reservoir.
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 5
    """,
)
def sample_k_per_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _sample_k_per_group(docs, "source", "doc_id", 5).select(
        "doc_id", "source"
    )


@register(
    "dedup_paragraph",
    # Passage-level exact dedup (the C4/RefinedWeb step below doc-level):
    # 10-word chunks → md5 fingerprint → corpus-wide duplicate groups.
    # Shuffles 16-byte fingerprints, never chunk text.
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    c AS (
      SELECT doc_id,
             unnest([array_to_string(words[(k*{_CHUNK_WORDS}+1):(k*{_CHUNK_WORDS}+{_CHUNK_WORDS})], ' ')
                     FOR k IN range(0, CAST(ceil(len(words)/{_CHUNK_WORDS}.0) AS INT))]) AS chunk
      FROM w
    )
    SELECT md5(chunk) AS fingerprint, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
    FROM c GROUP BY md5(chunk) HAVING count(*) > 1
    """,
)
def dedup_paragraph(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id", F.explode(chunk_text(docs, "text", _CHUNK_WORDS)).alias("chunk")
    )
    return (
        chunks.groupBy(F.md5("chunk").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


_N_SHARDS = 8
# portable shard expression — identical semantics to operators.training
# .shard_bucket (first two md5 hex digits → 0..255, mod shards)
_SHARD_SQL = (
    "CAST((("
    "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
    f") % {_N_SHARDS}) AS BIGINT)"
)


def _pack_ctes(rel: str, extra: str = "") -> str:
    """The sharded next-fit packing walk as recursive CTEs over ``rel``
    (which must expose source, doc_id, text[, extra]) — ONE definition
    shared by pack_sequences and flagship_corpus_pipeline so the walk,
    the shard key, and the budget can never drift between them."""
    e = f", {extra}" if extra else ""
    ed = f", d.{extra}" if extra else ""
    return f"""sharded AS (
      SELECT source, doc_id{e},
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {_SHARD_SQL} AS shard
      FROM {rel}
    ),
    docs2 AS (
      SELECT source, shard, doc_id{e}, n_tokens,
             row_number() OVER (PARTITION BY source, shard
                                ORDER BY doc_id) AS rn
      FROM sharded
    ),
    packed AS (
      SELECT source, shard, doc_id{e}, n_tokens, rn,
             CAST(1 AS BIGINT) AS bin_id, n_tokens AS fill
      FROM docs2 WHERE rn = 1
      UNION ALL
      SELECT d.source, d.shard, d.doc_id{ed}, d.n_tokens, d.rn,
             CASE WHEN p.fill + d.n_tokens <= {_PACK_BUDGET}
                  THEN p.bin_id ELSE p.bin_id + 1 END,
             CASE WHEN p.fill + d.n_tokens <= {_PACK_BUDGET}
                  THEN p.fill + d.n_tokens ELSE d.n_tokens END
      FROM docs2 d JOIN packed p
        ON d.source = p.source AND d.shard = p.shard AND d.rn = p.rn + 1
    )"""


@register(
    "pack_sequences",
    # Next-fit sequence packing per (source, hash-shard) — the composite
    # key keeps a dominant source parallel across cores (VERDICT r2 #3);
    # the oracle replays the identical per-shard sequential walk with a
    # recursive CTE. Genuinely stateful custom operator (applyInPandas)
    # with an exact cross-engine gate.
    f"""
    WITH RECURSIVE {_pack_ctes('documents')}
    SELECT source, shard, doc_id, n_tokens, bin_id FROM packed
    """,
)
def pack_sequences(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return pack_next_fit(
        sized, "source", "doc_id", "n_tokens",
        budget=_PACK_BUDGET, shards=_N_SHARDS,
    )


@register(
    "sample_mixture_balance",
    # Data-mixing rebalance: downsample every language to ≈ the smallest
    # language's row count (uniform mixture; en is 3× over-represented in
    # this corpus) with the same deterministic
    # md5-prefix draw. Per-source rate → 8-hex threshold; the float
    # product/division order is IDENTICAL on both engines so floor() can't
    # disagree. lower() because to_hex/hex are uppercase but md5 is lower.
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    th AS (
      SELECT lang,
             lower(lpad(to_hex(CAST(least(
               floor((SELECT min(n) FROM c) * 4294967296.0 / n),
               4294967295) AS BIGINT)), 8, '0')) AS threshold
      FROM c
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN th ON d.lang = th.lang
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.threshold
    """,
)
def sample_mixture_balance(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.training import hex_uniform

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # min over an empty-partition window: input is the per-lang counts
    # (languages, not rows) — tiny by construction
    counts = counts.withColumn(
        "target", F.min("n").over(Window.partitionBy())
    )
    threshold = F.lower(
        F.lpad(
            F.hex(
                F.least(
                    F.floor(F.col("target") * F.lit(4294967296.0) / F.col("n")),
                    F.lit(4294967295),
                ).cast("long")
            ),
            8,
            "0",
        )
    )
    th = counts.select("lang", threshold.alias("threshold"))
    return (
        docs.join(F.broadcast(th), "lang")
        .filter(hex_uniform(F.col("doc_id")) < F.col("threshold"))
        .select("doc_id", "lang")
    )


@register(
    "filter_length_quantiles",
    # Quantile-based length filter (drop the tails a quality pipeline
    # trims): keep docs with n_chars within [p5, p95]. Exact interpolated
    # percentiles — Spark `percentile` ≡ DuckDB `quantile_cont` (the
    # agg_exact_percentiles precedent), so the cutoffs are bit-identical.
    """
    WITH q AS (
      SELECT quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM documents, q
    WHERE n_chars >= q.lo AND n_chars <= q.hi
    """,
)
def filter_length_quantiles(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    q = docs.agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(q))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "source", "n_chars")
    )


@register(
    "text_boilerplate_strip",
    # C4-style boilerplate removal: any 10-word chunk appearing in >2
    # distinct docs is boilerplate; docs are rebuilt from their kept
    # chunks in order. The boilerplate fingerprint set broadcasts
    # (distinct chunks, not rows); reassembly is a grouped ordered concat.
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    c AS (
      SELECT doc_id, k,
             array_to_string(words[(k*{_CHUNK_WORDS}+1):(k*{_CHUNK_WORDS}+{_CHUNK_WORDS})], ' ') AS chunk
      FROM w, LATERAL unnest(generate_series(0,
        CAST(ceil(len(words)/{_CHUNK_WORDS}.0) AS INT) - 1)) t(k)
    ),
    boiler AS (
      SELECT md5(chunk) AS fp FROM c GROUP BY md5(chunk)
      HAVING count(DISTINCT doc_id) > 2
    ),
    kept AS (
      SELECT doc_id, k, chunk FROM c
      WHERE md5(chunk) NOT IN (SELECT fp FROM boiler)
    ),
    totals AS (SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY k) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_chunks - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
           coalesce(r.clean_text, '') AS clean_text
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def text_boilerplate_strip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        F.posexplode(chunk_text(docs, "text", _CHUNK_WORDS)).alias("k", "chunk"),
    )
    boiler = (
        chunks.groupBy(F.md5("chunk").alias("fp"))
        .agg(F.count_distinct("doc_id").alias("d"))
        .filter(F.col("d") > 2)
        .select("fp")
    )
    kept = chunks.join(
        F.broadcast(boiler), F.md5(F.col("chunk")) == F.col("fp"), "left_anti"
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


@register(
    "flagship_corpus_pipeline",
    # The corpus-shaping pipeline END-TO-END as one lazy DAG: p5–p95
    # length filter → exact-dedup keep-first (min doc_id per text hash) →
    # per-language mixture rebalance (thresholds derived from the
    # SURVIVING docs) → next-fit packing per source. The oracle replays
    # every stage in CTEs, so a drift anywhere in the chain hash-fails.
    f"""
    WITH RECURSIVE q AS (
      SELECT quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents
    ),
    filtered AS (
      SELECT d.* FROM documents d, q WHERE d.n_chars >= q.lo AND d.n_chars <= q.hi
    ),
    keepers AS (
      SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
    ),
    deduped AS (
      SELECT f.* FROM filtered f JOIN keepers k ON f.doc_id = k.doc_id
    ),
    c AS (SELECT lang, count(*) AS n FROM deduped GROUP BY lang),
    th AS (
      SELECT lang,
             lower(lpad(to_hex(CAST(least(
               floor((SELECT min(n) FROM c) * 4294967296.0 / n),
               4294967295) AS BIGINT)), 8, '0')) AS threshold
      FROM c
    ),
    balanced AS (
      SELECT d.* FROM deduped d JOIN th ON d.lang = th.lang
      WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.threshold
    ),
    {_pack_ctes('balanced', 'lang')}
    SELECT source, shard, doc_id, lang, n_tokens, bin_id FROM packed
    """,
)
def flagship_corpus_pipeline(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.training import hex_uniform

    docs = load_table(spark, sf_dir, "documents")
    q = docs.agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    # filtered feeds BOTH the keeper-set aggregate and the semi join;
    # deduped feeds BOTH the per-lang counts and the balance filter —
    # persist the reused stages or each branch re-executes the whole
    # upstream subtree (~4× the scan+filter cost). At 100 TB the same
    # boundary is where a real pipeline materializes stage output to
    # storage; MEMORY_AND_DISK persist is the single-job equivalent.
    filtered = docs.crossJoin(F.broadcast(q)).filter(
        (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
    ).persist()
    keepers = filtered.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    deduped = filtered.join(
        keepers.select("doc_id"), "doc_id", "left_semi"
    ).persist()
    counts = deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.withColumn("target", F.min("n").over(Window.partitionBy()))
    threshold = F.lower(
        F.lpad(
            F.hex(
                F.least(
                    F.floor(F.col("target") * F.lit(4294967296.0) / F.col("n")),
                    F.lit(4294967295),
                ).cast("long")
            ),
            8,
            "0",
        )
    )
    th = counts.select("lang", threshold.alias("threshold"))
    balanced = deduped.join(F.broadcast(th), "lang").filter(
        hex_uniform(F.col("doc_id")) < F.col("threshold")
    )
    sized = balanced.select(
        "source",
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    # the SAME operator (and walk) pack_sequences gates — lang rides
    # through as a pass-through column
    return pack_next_fit(
        sized, "source", "doc_id", "n_tokens",
        budget=_PACK_BUDGET, shards=_N_SHARDS, extra_cols=("lang",),
    )


_BYTE_SQL = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))"
)


@register(
    "sample_dataset_split",
    # Deterministic train/val/test assignment from the doc-id hash byte
    # (~90/5/5): content-independent, reproducible under retries and
    # repartitioning, and portable — the identical byte is computable in
    # DuckDB. The query audits the split: per (source, split) doc and
    # char totals. Map-side assignment; one shuffle for the audit groupBy.
    f"""
    SELECT source,
           CASE WHEN {_BYTE_SQL} < 230 THEN 'train'
                WHEN {_BYTE_SQL} < 243 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1, 2
    """,
)
def sample_dataset_split(spark, sf_dir):
    from ..operators.training import shard_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = shard_bucket(F.col("doc_id"), 256)
    split = (
        F.when(b < 230, F.lit("train"))
        .when(b < 243, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.groupBy("source", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_U32_SQL = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ")"
)


@register(
    "sample_weighted_reservoir",
    # Efraimidis–Sirivianos weighted reservoir: per-source top-3 by
    # key = u^(1/n_chars), u a deterministic 32-bit hash draw — longer
    # docs proportionally likelier, no RNG state, partition-invariant.
    # Key rounded to 6dp on both engines (libm pow last-ulp differs),
    # doc_id tie-break.
    f"""
    SELECT doc_id, source, n_chars, sample_key, rk FROM (
      SELECT doc_id, source, n_chars,
             round(pow(({_U32_SQL} + 0.5) / 4294967296.0,
                       1.0 / n_chars), 6) AS sample_key,
             row_number() OVER (
               PARTITION BY source
               ORDER BY round(pow(({_U32_SQL} + 0.5) / 4294967296.0,
                              1.0 / n_chars), 6) DESC, doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 3
    """,
)
def sample_weighted_reservoir(spark, sf_dir):
    from ..operators.training import weighted_sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_k_per_group(
        docs, "source", "doc_id", "n_chars", 3
    ).select("doc_id", "source", "n_chars", "sample_key", "rk")


@register(
    "sample_temperature",
    # Temperature-reweighted mixture sampling (T=2, the standard
    # multilingual-corpus rebalance: sampling probability per source
    # ∝ share^(1/T), i.e. ∝ sqrt(n) — dominant sources are damped, tails
    # up-weighted relative to proportional sampling). Deterministic
    # md5-prefix Bernoulli like every sampler here; the per-source
    # threshold is computed on an EXACT integer lattice (w = floor(sqrt(n))
    # as BIGINT, K = floor(total/2); every product stays < 2^53, so the
    # one double division is bit-identical across engines). Map-side
    # filter against a broadcast threshold table — no corpus shuffle.
    """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    w AS (SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS w FROM c),
    tot AS (
      SELECT CAST(sum(w) AS BIGINT) AS sw,
             CAST(floor(sum(n) / 2.0) AS BIGINT) AS k
      FROM w
    ),
    th AS (
      SELECT source,
             lower(lpad(to_hex(CAST(least(
               floor(k * w * 4294967296.0 / (sw * n)),
               4294967295) AS BIGINT)), 8, '0')) AS threshold
      FROM w CROSS JOIN tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN th ON d.source = th.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.threshold
    """,
)
def sample_temperature(spark, sf_dir):
    from ..operators.training import hex_uniform

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = c.withColumn("w", F.floor(F.sqrt(F.col("n"))).cast("long"))
    tot = w.agg(
        F.sum("w").cast("long").alias("sw"),
        F.floor(F.sum("n") / 2.0).cast("long").alias("k"),
    )
    threshold = F.lower(
        F.lpad(
            F.hex(
                F.least(
                    F.floor(
                        F.col("k") * F.col("w") * F.lit(4294967296.0)
                        / (F.col("sw") * F.col("n"))
                    ),
                    F.lit(4294967295),
                ).cast("long")
            ),
            8,
            "0",
        )
    )
    th = w.crossJoin(F.broadcast(tot)).select("source", threshold.alias("threshold"))
    return (
        docs.join(F.broadcast(th), "source")
        .filter(hex_uniform(F.col("doc_id")) < F.col("threshold"))
        .select("doc_id", "source")
    )


@register(
    "sample_token_budget",
    # Greedy budgeted selection — "highest-quality docs first until 1/3 of
    # the corpus token count is spent". The global best-first running sum
    # uses the bucketed block-prefix plan (see select_to_token_budget: no
    # single-partition window); the oracle replays the identical total
    # order (n_chars DESC, doc_id) with a plain window cumsum. Tokens =
    # whitespace word count; budget = floor(total_tokens / 3).
    """
    WITH scored AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    tot AS (SELECT CAST(floor(sum(n_tokens) / 3.0) AS BIGINT) AS budget FROM scored),
    walk AS (
      SELECT doc_id, n_chars, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_tokens
      FROM scored
    )
    SELECT w.doc_id, w.n_chars, w.n_tokens, w.cum_tokens
    FROM walk w CROSS JOIN tot t
    WHERE w.cum_tokens <= t.budget
    """,
)
def sample_token_budget(spark, sf_dir):
    from ..operators.training import select_to_token_budget

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    budget = scored.agg(
        F.floor(F.sum("n_tokens") / 3.0).cast("long").alias("budget")
    )
    scored = scored.crossJoin(F.broadcast(budget))
    return select_to_token_budget(
        scored, order_col="n_chars", token_col="n_tokens"
    ).select("doc_id", "n_chars", "n_tokens", "cum_tokens")


@register(
    "sample_quality_bernoulli",
    # Per-ROW weighted Bernoulli sampling (the rate-based cousin of the
    # A-ES without-replacement sampler): each doc keeps with probability
    # proportional to its length-derived quality weight, via the same
    # deterministic md5-prefix draw — u32(md5(id)) < w/w_max · 2^32.
    # Thresholds stay on an exact integer lattice (weights and the global
    # max are BIGINTs; one double division, both engines bit-identical).
    # Map-side filter against a broadcast 1-row max — no corpus shuffle.
    """
    WITH w AS (
      SELECT doc_id, least(n_chars, 1000) AS wt FROM documents
    ),
    m AS (SELECT max(wt) AS wmax FROM w)
    SELECT w.doc_id, CAST(w.wt AS BIGINT) AS wt
    FROM w CROSS JOIN m
    WHERE CAST(('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < floor(w.wt * 4294967296.0 / m.wmax)
    """,
)
def sample_quality_bernoulli(spark, sf_dir):
    from ..operators.training import hex_uniform_u32

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.least(F.col("n_chars"), F.lit(1000)).alias("wt")
    )
    m = w.agg(F.max("wt").alias("wmax"))
    return (
        w.crossJoin(F.broadcast(m))
        .filter(
            hex_uniform_u32(F.col("doc_id"))
            < F.floor(F.col("wt") * F.lit(4294967296.0) / F.col("wmax"))
        )
        .select("doc_id", F.col("wt").cast("long").alias("wt"))
    )



# DSIR importance-weight chain (features -> bucket counts -> lambda
# table -> per-doc logw), shared by sample_dsir and the r9 ESS
# diagnostic so the weight model can never drift between them.
_DSIR_LOGW_CTES = """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      FROM documents
    ),
    lbl AS (
      SELECT doc_id, w,
             (len(w) >= 10 AND len(w) <= 1000
              AND list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w)
                  BETWEEN 3.0 AND 10.0) AS tgt
      FROM base WHERE len(w) > 0
    ),
    g AS (
      SELECT doc_id, tgt,
             unnest(w || CASE WHEN len(w) >= 2
                    THEN [w[i] || '_' || w[i+1] FOR i IN range(1, len(w))]
                    ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM lbl
    ),
    bk AS (
      SELECT doc_id, tgt,
             CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 1024 AS b
      FROM g
    ),
    cnt AS (
      SELECT b, count(*) AS nr,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS nt
      FROM bk GROUP BY b
    ),
    tot AS (SELECT sum(nr) AS tr, sum(nt) AS tt FROM cnt),
    lam AS (
      SELECT b, round(ln((nt + 1.0) / (tt + 1024.0))
                      - ln((nr + 1.0) / (tr + 1024.0)), 6) AS lam
      FROM cnt CROSS JOIN tot
    ),
    sc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             round(sum(lam), 6) AS logw
      FROM bk JOIN lam USING (b) GROUP BY doc_id
    )
"""


@register(
    "sample_dsir",
    # DSIR importance resampling (Xie et al. 2023; operators/text.py
    # dsir_resample — VERDICT r6 next-round #5): hashed unigram+bigram
    # bucket counts give target-vs-raw log-likelihood-ratio weights
    # (6dp lattice), Gumbel top-k over logw + md5-lattice noise = a
    # deterministic without-replacement draw ∝ importance weight. The
    # oracle replays feature hashing, both models, the λ table, per-doc
    # sums, the Gumbel keys, and the top-100 cut — drift anywhere
    # hash-fails.
    "WITH "
    + _DSIR_LOGW_CTES.strip().removeprefix("WITH ")
    + f"""
    SELECT doc_id, n_grams, logw,
           round(logw + round(-ln(-ln(({_U32_SQL} + 0.5) / 4294967296.0)),
                              6), 6) AS gumbel_key
    FROM sc
    ORDER BY gumbel_key DESC, doc_id
    LIMIT 100
    """,
)
def sample_dsir(spark, sf_dir):
    from ..operators.text import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    return dsir_resample(docs, "doc_id", "text", n_buckets=1024, k=100)


_GROUP_BYTE = (
    "((strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))"
)


@register(
    "sample_group_split",
    # GROUP-AWARE train/val/test split (the leakage guard
    # sample_dataset_split lacks): the split is assigned from the hash of
    # the GROUP key (user_id), so every event of a user lands in the same
    # split — near-duplicate rows from one user can never straddle
    # train/test. ~80/10/10 from the user-id hash byte. The audit output
    # carries the leakage check itself: `leaked_users` counts users seen
    # in more than one split, and is 0 BY CONSTRUCTION — an oracle
    # mismatch here means the group-hash invariant broke.
    f"""
    WITH ev AS (
      SELECT user_id,
             CASE WHEN {_GROUP_BYTE} < 204 THEN 'train'
                  WHEN {_GROUP_BYTE} < 230 THEN 'val'
                  ELSE 'test' END AS split
      FROM events
    ),
    leak AS (
      SELECT count(*) AS leaked_users FROM (
        SELECT user_id FROM ev GROUP BY user_id
        HAVING count(DISTINCT split) > 1)
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(leaked_users AS BIGINT) AS leaked_users
    FROM ev CROSS JOIN leak GROUP BY split, leaked_users
    """,
)
def sample_group_split(spark, sf_dir):
    """Scale shape: map-side split assignment (hash of the group key, no
    join against a user table), one distinct-aggregate pass for the
    audit and one grouped pass for the stats — two scans, zero windows;
    the 1-row leakage count broadcasts."""
    from ..operators.training import shard_bucket

    ev = load_table(spark, sf_dir, "events").select("user_id")
    b = shard_bucket(F.col("user_id"), 256)
    split = (
        F.when(b < 204, F.lit("train"))
        .when(b < 230, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    ev = ev.withColumn("split", split)
    leak = (
        ev.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_users"))
    )
    return (
        ev.crossJoin(F.broadcast(leak))
        .groupBy("split", "leaked_users")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("split", "n_events", "n_users", "leaked_users")
    )


_PCT_ROUNDS = 3


def _perceptron_oracle(rounds: int) -> str:
    margin = "y * (w.b * x0 + w.w1 * x1 + w.w2 * x2)"

    def s(expr: str) -> str:
        return (
            f"CAST(coalesce(sum(CASE WHEN {margin} <= 0 "
            f"THEN {expr} ELSE 0 END), 0) AS BIGINT)"
        )

    parts = [
        """f AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             CAST(1 AS BIGINT) AS x0,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT) AS x1,
             CAST(length(text) AS BIGINT) AS x2
      FROM documents
    )""",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS w1, "
        "CAST(0 AS BIGINT) AS w2)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"m{r} AS (SELECT {s('y * x0')} AS d0, {s('y * x1')} AS d1, "
            f"{s('y * x2')} AS d2, {s('1')} AS miss "
            f"FROM f, w{r - 1} w)"
        )
        parts.append(
            f"w{r} AS (SELECT w.b + m.d0 AS b, w.w1 + m.d1 AS w1, "
            f"w.w2 + m.d2 AS w2 FROM w{r - 1} w, m{r} m)"
        )
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS round, w.b AS w_bias, "
        f"w.w1 AS w_words, w.w2 AS w_chars, m.miss AS n_miss "
        f"FROM w{r} w, m{r} m"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@register(
    "train_perceptron_lang",
    # Batch-gradient perceptron on INTEGER features (r8;
    # operators/text.py perceptron_train): labels ±1 from lang='en',
    # features (1, word count, char count), update w += Σ_mis y·x per
    # round — every quantity an integer, so the oracle replays all 3
    # rounds bit-for-bit with NO float lattice anywhere (the strongest
    # form of the Lloyd/BPE iteration-replay convention). The weight
    # vector is fixed-size driver state (the fixed-size-model rule);
    # one map-side-partial aggregation job per round.
    _perceptron_oracle(_PCT_ROUNDS),
)
def train_perceptron_lang(spark, sf_dir):
    from ..operators.text import perceptron_train

    return perceptron_train(
        load_table(spark, sf_dir, "documents"), rounds=_PCT_ROUNDS
    )


_TE_SMOOTH = 20


@register(
    "train_target_encoding",
    # Smoothed target (mean) encoding (Micci-Barreca 2001 — the standard
    # categorical-feature encoder; r8): enc(seg) = (Σy + m·prior)/(n + m)
    # with the global-mean prior and m=20. Both the per-segment sum and
    # the prior go onto the 6dp lattice BEFORE the blend so the single
    # fixed-tree float expression is engine-identical. One grouped pass
    # + a 1-row broadcast prior — map-side partials, no window.
    f"""
    WITH p AS (SELECT round(avg(c_acctbal), 6) AS prior FROM customer),
    g AS (
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             round(sum(c_acctbal), 6) AS sum_y
      FROM customer GROUP BY 1
    )
    SELECT g.c_mktsegment, g.n, p.prior,
           round((g.sum_y + {_TE_SMOOTH} * p.prior) / (g.n + {_TE_SMOOTH}), 6)
             AS encoded
    FROM g, p
    """,
)
def train_target_encoding(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    prior = c.agg(F.round(F.avg("c_acctbal"), 6).alias("prior"))
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 6).alias("sum_y"),
    )
    return g.crossJoin(F.broadcast(prior)).select(
        "c_mktsegment",
        "n",
        "prior",
        F.round(
            (F.col("sum_y") + _TE_SMOOTH * F.col("prior"))
            / (F.col("n") + _TE_SMOOTH),
            6,
        ).alias("encoded"),
    )


@register(
    "train_linreg_normal_eq",
    # Closed-form per-language OLS of n_chars on word count (r9;
    # operators/training.py linreg_normal_eq): every sufficient
    # statistic an exact BIGINT (integer features, one grouped pass),
    # the slope quotient 6dp-rounded, and the intercept computed from
    # the ALREADY-ROUNDED slope so both engines share the double.
    """
    WITH f AS (
      SELECT lang AS grp,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT) AS x,
             n_chars AS y
      FROM documents
    ),
    s AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM f GROUP BY grp
    ),
    sl AS (
      SELECT grp, n, sx, sy,
             CASE WHEN n * sxx - sx * sx <> 0 THEN
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             END AS slope
      FROM s
    )
    SELECT grp, n AS n_rows, slope,
           round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM sl
    """,
)
def train_linreg_normal_eq(spark, sf_dir):
    from ..operators.training import linreg_normal_eq
    from ..operators.text import words

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.size(words(F.col("text"))).alias("n_words"),
    )
    return linreg_normal_eq(docs, y_col="n_chars", x_col="n_words", group_col="lang")


@register(
    "sample_ess_diagnostic",
    # Effective sample size of the DSIR importance weights (r9 — the
    # go/no-go diagnostic every importance-sampling pipeline checks
    # before trusting a resample: ESS = (Σw)²/Σw²; Kong 1992). Weights
    # ride the 1e-6 integer lattice (w_u = half-up(e^logw·10⁶)); Σw_u
    # and Σw_u² are summed in DECIMAL(38,0)/HUGEINT (the graph_hits
    # overflow lesson — w_u² alone is ~10¹⁶ per row), and the two
    # quotients are deterministic double division of the exact sums.
    # Shares _DSIR_LOGW_CTES with sample_dsir, so the weight model
    # can't drift between the sampler and its diagnostic.
    "WITH "
    + _DSIR_LOGW_CTES.strip().removeprefix("WITH ")
    + """,
    w AS (
      SELECT CAST(floor(exp(logw) * 1000000.0 + 0.5) AS BIGINT) AS wu
      FROM sc
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             sum(wu) AS s1, sum(wu * wu) AS s2
      FROM w
    )
    SELECT n_docs,
           round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(s2 AS DOUBLE), 6) AS ess,
           round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(s2 AS DOUBLE) / n_docs, 6) AS ess_fraction
    FROM t
    """,
)
def sample_ess_diagnostic(spark, sf_dir):
    from ..operators.text import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    logw = dsir_resample(
        docs, "doc_id", "text", n_buckets=1024, k=100, scores_only=True
    )
    w = logw.select(
        F.floor(F.exp(F.col("logw")) * 1000000.0 + 0.5)
        .cast("long")
        .alias("wu")
    )
    t = w.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("wu").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("wu") * F.col("wu")).cast("decimal(38,0)")).alias("s2"),
    )
    ess = (
        F.col("s1").cast("double")
        * F.col("s1").cast("double")
        / F.col("s2").cast("double")
    )
    return t.select(
        "n_docs",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n_docs"), 6).alias("ess_fraction"),
    )


@register(
    "sample_curriculum_order",
    # Competence-based curriculum schedule (Platanios et al. 2019,
    # "Competence-based Curriculum Learning for NMT"): documents are
    # globally ranked by a difficulty proxy (whitespace token count,
    # ties → doc_id), split into 4 competence bands, and training stage
    # s consumes the CUMULATIVE prefix (bands 1..s) — the schedule a
    # data-loader materializes per epoch. The global rank comes from
    # operators/topk.py:global_rank (block-prefix — no single-partition
    # window at corpus scale); band assignment is the exact integer
    # floor((rank−1)·4/N)+1, and the cumulative stage totals re-use the
    # tiny 4-row band aggregate via a triangular join. All counts are
    # BIGINT; the stage fraction is one final division.
    """
    WITH diff AS (
      SELECT doc_id,
             CAST(length(list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) AS rank,
             count(*) OVER () AS n
      FROM diff
    ),
    bands AS (
      SELECT CAST((rank - 1) * 4 // n + 1 AS BIGINT) AS band,
             count(*) AS bn, sum(n_tokens) AS bt
      FROM ranked GROUP BY 1
    ),
    stages AS (
      SELECT s.band AS stage,
             CAST(sum(b.bn) AS BIGINT) AS n_docs,
             CAST(sum(b.bt) AS BIGINT) AS n_tokens
      FROM bands s JOIN bands b ON b.band <= s.band
      GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM diff)
    SELECT stage, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS frac_docs
    FROM stages CROSS JOIN tot
    """,
)
def sample_curriculum_order(spark, sf_dir):
    from ..operators.topk import global_rank

    docs = load_table(spark, sf_dir, "documents")
    diff = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    ranked = global_rank(diff, "n_tokens", "doc_id")
    tot = diff.agg(F.count(F.lit(1)).alias("total"))
    bands = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr("(rank - 1) * 4 div total").alias("band0"),
            "n_tokens",
        )
        .groupBy((F.col("band0") + 1).alias("band"))
        .agg(
            F.count(F.lit(1)).alias("bn"), F.sum("n_tokens").alias("bt")
        )
    )
    s = bands.select(F.col("band").alias("stage"))
    stages = (
        s.join(F.broadcast(bands), F.col("band") <= F.col("stage"))
        .groupBy("stage")
        .agg(F.sum("bn").alias("n_docs"), F.sum("bt").alias("n_tokens"))
    )
    return stages.crossJoin(F.broadcast(tot)).select(
        "stage", "n_docs", "n_tokens",
        F.round(
            F.col("n_docs").cast("double") / F.col("total").cast("double"),
            6,
        ).alias("frac_docs"),
    )


@register(
    "sample_unimax",
    # UniMax budget-capped language allocation (Chung et al. 2023,
    # "UniMax: Fairer and More Effective Language Sampling for
    # Large-Scale Multilingual Pretraining"): spread a token budget as
    # uniformly as possible across languages, capping each language at
    # its available corpus (1 epoch) — the water-filling walk over
    # languages sorted by availability ASCENDING (ties -> lang), where
    # each language takes min(avail, floor(remaining / langs_left)).
    # The walk is sequential but tiny (one row per language), so both
    # engines replay it exactly: Spark folds the sorted lang array with
    # F.aggregate on a 1-row frame (corpus-scale work is only the
    # per-lang token aggregate); DuckDB walks a recursive CTE. The
    # fair share uses EXACT integer division — Spark's (a - a%b)/b on
    # exactly-divisible DECIMALs (BigDecimal division of a divisible
    # numerator is exact; float floor(a/b) breaks past 2^53), DuckDB's
    # native // . Budget = floor(2/3 of total tokens) so at the shipped
    # distribution at least one language binds its cap and the
    # remainder genuinely redistributes.
    r"""
    WITH RECURSIVE tok AS (
      SELECT lang,
             CAST(sum(length(list_filter(string_split_regex(text, '\s+'),
                                         x -> x <> ''))) AS BIGINT) AS avail
      FROM documents GROUP BY 1
    ),
    ord AS (
      SELECT lang, avail,
             CAST(row_number() OVER (ORDER BY avail, lang) AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS k
      FROM tok
    ),
    tot AS (SELECT CAST(CAST(sum(avail) AS BIGINT) * 2 // 3 AS BIGINT) AS b
            FROM tok),
    walk AS (
      SELECT CAST(0 AS BIGINT) AS i, b AS rem, CAST(NULL AS VARCHAR) AS lang,
             CAST(NULL AS BIGINT) AS avail, CAST(NULL AS BIGINT) AS alloc
      FROM tot
      UNION ALL
      SELECT o.i, w.rem - least(o.avail, w.rem // (o.k - w.i)),
             o.lang, o.avail, least(o.avail, w.rem // (o.k - w.i))
      FROM walk w JOIN ord o ON o.i = w.i + 1
    )
    SELECT lang, avail AS avail_tokens, alloc AS alloc_tokens,
           round(CAST(alloc AS DOUBLE) / CAST(avail AS DOUBLE), 6)
             AS epochs_used
    FROM walk WHERE i > 0
    """,
)
def sample_unimax(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("lang").agg(
        F.sum(
            F.size(
                F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
            ).cast("long")
        ).alias("avail")
    )
    one = tok.agg(
        F.array_sort(
            F.collect_list(F.struct("avail", "lang"))
        ).alias("ordered"),
        (F.sum("avail") * 2 - (F.sum("avail") * 2) % 3)
        .cast("decimal(38,0)")
        .alias("b3"),
    ).select(
        "ordered",
        (F.col("b3") / F.lit(3).cast("decimal(19,0)"))
        .cast("long")
        .alias("budget"),
    )

    empty = F.array().cast(
        "array<struct<lang:string,avail:bigint,alloc:bigint>>"
    )
    k = F.size(F.col("ordered")).cast("long")

    def exact_div(a, b):
        # exactly-divisible DECIMAL division is exact (BigDecimal);
        # float floor(a/b) would break past 2^53 at corpus scale
        return (
            (a - a % b).cast("decimal(38,0)") / b.cast("decimal(19,0)")
        ).cast("long")

    def step(acc, x):
        left = k - F.size(acc["allocs"]).cast("long")
        fair = exact_div(acc["rem"], left)
        alloc = F.least(x["avail"], fair)
        return F.struct(
            (acc["rem"] - alloc).alias("rem"),
            F.concat(
                acc["allocs"],
                F.array(
                    F.struct(
                        x["lang"].alias("lang"),
                        x["avail"].alias("avail"),
                        alloc.alias("alloc"),
                    )
                ),
            ).alias("allocs"),
        )

    folded = one.select(
        F.aggregate(
            F.col("ordered"),
            F.struct(
                F.col("budget").alias("rem"), empty.alias("allocs")
            ),
            step,
        )["allocs"].alias("allocs")
    )
    return folded.select(F.explode("allocs").alias("a")).select(
        F.col("a.lang").alias("lang"),
        F.col("a.avail").alias("avail_tokens"),
        F.col("a.alloc").alias("alloc_tokens"),
        F.round(
            F.col("a.alloc").cast("double")
            / F.col("a.avail").cast("double"),
            6,
        ).alias("epochs_used"),
    )


@register(
    "train_isotonic_calibration",
    # Isotonic regression (PAV) of the urgent-order rate against 16
    # price bands — the calibration fit (Zadrozny & Elkan 2002) that
    # turns a monotone-believed score into probabilities. PAV's merge
    # cascade is unbounded, so both engines instead evaluate the EXACT
    # min-max identity fit_i = max_{j<=i} min_{k>=i} mean(pos, j..k)
    # (Barlow et al. 1972) — provably the PAV solution — over the
    # 16-row band aggregate: interval sums from a triangular
    # self-join, each interval mean ONE division of exact BIGINTs
    # (identical doubles on both engines), then min/max of identical
    # doubles. Corpus-scale work is only the band groupBy; the
    # 16-row grid join is O(bands^3) on a broadcast-sized frame.
    """
    WITH b AS (
      SELECT least(CAST(o_totalprice AS BIGINT) // 31250, 15) AS band,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT band, n, pos,
             CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS cn,
             CAST(sum(pos) OVER (ORDER BY band) AS BIGINT) AS cp
      FROM b
    ),
    ivals AS (
      SELECT lo.band AS j, hi.band AS k,
             CAST(hi.cp - lo.cp + lo.pos AS DOUBLE)
               / CAST(hi.cn - lo.cn + lo.n AS DOUBLE) AS avg_jk
      FROM pre lo JOIN pre hi ON lo.band <= hi.band
    ),
    inner_min AS (
      SELECT i.band, v.j, min(v.avg_jk) AS mn
      FROM b i JOIN ivals v ON v.j <= i.band AND i.band <= v.k
      GROUP BY i.band, v.j
    ),
    fit AS (
      SELECT band, max(mn) AS iso FROM inner_min GROUP BY band
    )
    SELECT b.band, b.n, b.pos,
           round(CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
             AS raw_rate,
           round(fit.iso, 6) AS iso_rate
    FROM b JOIN fit ON b.band = fit.band
    """,
)
def train_isotonic_calibration(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy(
        F.least(
            (F.col("o_totalprice").cast("long") / F.lit(31250))
            .cast("long"),
            F.lit(15).cast("long"),
        ).alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("o_orderpriority") == "1-URGENT").cast("int")
        ).cast("long").alias("pos"),
    )
    # 16-row frame: the single-partition prefix window is over the
    # FIXED band grid, not the corpus
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    pre = b.select(
        "band", "n", "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    )
    lo = pre.select(
        F.col("band").alias("j"),
        F.col("cn").alias("cn_lo"),
        F.col("cp").alias("cp_lo"),
        F.col("n").alias("n_lo"),
        F.col("pos").alias("pos_lo"),
    )
    hi = pre.select(
        F.col("band").alias("k"),
        F.col("cn").alias("cn_hi"),
        F.col("cp").alias("cp_hi"),
    )
    ivals = lo.join(F.broadcast(hi), F.col("j") <= F.col("k")).select(
        "j", "k",
        (
            (F.col("cp_hi") - F.col("cp_lo") + F.col("pos_lo")).cast(
                "double"
            )
            / (F.col("cn_hi") - F.col("cn_lo") + F.col("n_lo")).cast(
                "double"
            )
        ).alias("avg_jk"),
    )
    idx = b.select(F.col("band"))
    inner_min = (
        idx.join(
            F.broadcast(ivals),
            (F.col("j") <= F.col("band")) & (F.col("band") <= F.col("k")),
        )
        .groupBy("band", "j")
        .agg(F.min("avg_jk").alias("mn"))
    )
    fit = inner_min.groupBy("band").agg(F.max("mn").alias("iso"))
    return b.join(F.broadcast(fit), "band").select(
        "band", "n", "pos",
        F.round(
            F.col("pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("raw_rate"),
        F.round("iso", 6).alias("iso_rate"),
    )


@register(
    "sample_mw_reweight",
    # DoReMi-style domain reweighting (Xie et al. 2023): one
    # multiplicative-weights step over sources, where each domain's
    # excess "loss" (verbosity: chars-per-token vs the corpus rate) is
    # QUANTIZED to integer steps and the weight update is 2^steps —
    # powers of two are exact IEEE doubles and their 20-term sum is
    # order-independent (all terms within a 2^16 window), so the
    # normalized weights are bit-identical on both engines with no exp()
    # (libm exp differs across engines in the last ulp — the midpoint
    # class). Steps = clamp(floor(512·ch_d·tk_tot / (ch_tot·tk_d)) −
    # 512, ±8), all in DECIMAL(38,0)/HUGEINT (ch·tk products overflow
    # int64 at corpus scale); the final smoothing is DoReMi's uniform
    # mix alpha = 0.7·alpha' + 0.3/k (0.7 is not a lattice-midpoint
    # weight). One scan, one 20-row aggregate — no shuffle beyond it.
    r"""
    WITH d AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS ch,
             CAST(sum(length(list_filter(string_split_regex(text, '\s+'),
                                         x -> x <> ''))) AS BIGINT) AS tk,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(ch) AS BIGINT) AS cht, CAST(sum(tk) AS BIGINT) AS tkt
      FROM d
    ),
    st AS (
      SELECT source, n_docs,
             greatest(least(
               CAST(CAST(512 AS HUGEINT) * CAST(ch AS HUGEINT)
                    * CAST(tkt AS HUGEINT)
                    // (CAST(cht AS HUGEINT) * CAST(tk AS HUGEINT))
                    AS BIGINT) - 512,
               8), -8) AS steps
      FROM d CROSS JOIN tot
    ),
    w AS (
      SELECT source, n_docs, steps, power(2.0, steps) AS wt FROM st
    ),
    z AS (SELECT sum(wt) AS zz, CAST(count(*) AS BIGINT) AS k FROM w)
    SELECT source, n_docs, steps,
           round(wt / zz, 6) AS alpha_prime,
           round(0.7 * (wt / zz) + 0.3 / k, 6) AS alpha
    FROM w CROSS JOIN z
    """,
)
def sample_mw_reweight(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    d = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("ch"),
        F.sum(
            F.size(
                F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
            ).cast("long")
        ).alias("tk"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tot = d.agg(
        F.sum("ch").cast("long").alias("cht"),
        F.sum("tk").cast("long").alias("tkt"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = F.lit(512).cast("decimal(38,0)") * dec("ch") * dec("tkt")
    den = dec("cht") * dec("tk")
    qexact = ((num - num % den) / den).cast("long")
    st = d.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.greatest(
            F.least(qexact - 512, F.lit(8).cast("long")),
            F.lit(-8).cast("long"),
        ).alias("steps"),
    )
    w = st.withColumn("wt", F.pow(F.lit(2.0), F.col("steps")))
    z = w.agg(
        F.sum("wt").alias("zz"), F.count(F.lit(1)).alias("k")
    )
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "steps",
        F.round(F.col("wt") / F.col("zz"), 6).alias("alpha_prime"),
        F.round(
            F.lit(0.7) * (F.col("wt") / F.col("zz"))
            + F.lit(0.3) / F.col("k"),
            6,
        ).alias("alpha"),
    )


_BFD_BUDGET = 200


@register(
    "pack_bestfit",
    # Best-fit-decreasing sequence packing (operators/training.py:
    # pack_best_fit) — the offline bin-packing heuristic context-window
    # builders run, beside the streaming-shaped next-fit of
    # pack_sequences. Docs sorted by token count DESC (ties doc_id);
    # each goes to the open bin with the least residual capacity that
    # fits, ties -> lowest bin id, else a new bin. The oracle replays
    # the walk per (source, shard) with a recursive CTE carrying the
    # bin-fill LIST: chosen = first position of the max fitting fill
    # (list_position's first-occurrence = the operator's
    # strictly-greater loop), all-integer state — drift in the sort,
    # the tie rule, or one fill hash-fails row-level.
    f"""
    WITH RECURSIVE sharded AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {_SHARD_SQL} AS shard
      FROM documents
    ),
    docs2 AS (
      SELECT source, shard, doc_id, n_tokens,
             row_number() OVER (PARTITION BY source, shard
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM sharded
    ),
    walk AS (
      SELECT source, shard, doc_id, n_tokens, rn,
             CAST(1 AS BIGINT) AS bin_id,
             [n_tokens] AS fills
      FROM docs2 WHERE rn = 1
      UNION ALL
      SELECT d.source, d.shard, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN list_max(list_filter(p.fills,
                      f -> f + d.n_tokens <= {_BFD_BUDGET})) IS NULL
                  THEN CAST(len(p.fills) + 1 AS BIGINT)
                  ELSE CAST(list_position(p.fills,
                         list_max(list_filter(p.fills,
                           f -> f + d.n_tokens <= {_BFD_BUDGET})))
                       AS BIGINT) END,
             CASE WHEN list_max(list_filter(p.fills,
                      f -> f + d.n_tokens <= {_BFD_BUDGET})) IS NULL
                  THEN list_append(p.fills, d.n_tokens)
                  ELSE [CASE WHEN k = list_position(p.fills,
                               list_max(list_filter(p.fills,
                                 f -> f + d.n_tokens <= {_BFD_BUDGET})))
                             THEN p.fills[k] + d.n_tokens
                             ELSE p.fills[k] END
                        FOR k IN range(1, CAST(len(p.fills) AS INT) + 1)]
             END
      FROM docs2 d JOIN walk p
        ON d.source = p.source AND d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT source, shard, doc_id, n_tokens, bin_id FROM walk
    """,
)
def pack_bestfit(spark, sf_dir):
    from ..operators.training import pack_best_fit

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return pack_best_fit(
        sized, "source", "doc_id", "n_tokens",
        budget=_BFD_BUDGET, shards=_N_SHARDS,
    )


@register(
    "train_decision_stump",
    # Depth-1 decision tree (the boosting weak learner / CART root
    # split): over 16 price bands, pick the threshold minimizing
    # weighted Gini impurity for predicting urgent priority. Since
    # n_l + n_r is constant, argmin(weighted Gini) = argmax of
    # I_s = (pos_l^2 + neg_l^2)/n_l + (pos_r^2 + neg_r^2)/n_r — each
    # term ONE division of exact BIGINTs, so every candidate's score is
    # the identical double on both engines and the argmax (ties ->
    # lowest split) cannot flap. Corpus-scale work is the band groupBy;
    # the split scan is a 15-row prefix-sum window over the fixed grid.
    """
    WITH b AS (
      SELECT least(CAST(o_totalprice AS BIGINT) // 31250, 15) AS band,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT band, CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS cn,
             CAST(sum(pos) OVER (ORDER BY band) AS BIGINT) AS cp,
             CAST(sum(n) OVER () AS BIGINT) AS nt,
             CAST(sum(pos) OVER () AS BIGINT) AS pt
      FROM b
    ),
    splits AS (
      SELECT band + 1 AS split_band,
             cn AS n_left, cp AS pos_left,
             nt - cn AS n_right, pt - cp AS pos_right,
             CAST(cp * cp + (cn - cp) * (cn - cp) AS DOUBLE)
               / CAST(cn AS DOUBLE)
             + CAST((pt - cp) * (pt - cp)
                    + ((nt - cn) - (pt - cp)) * ((nt - cn) - (pt - cp))
                    AS DOUBLE) / CAST(nt - cn AS DOUBLE) AS score
      FROM pre WHERE nt - cn > 0
    ),
    best AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, split_band) AS rk
      FROM splits
    )
    SELECT split_band, n_left, pos_left, n_right, pos_right,
           round(score, 6) AS score,
           round(CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE), 6)
             AS rate_left,
           round(CAST(pos_right AS DOUBLE) / CAST(n_right AS DOUBLE), 6)
             AS rate_right
    FROM best WHERE rk = 1
    """,
)
def train_decision_stump(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy(
        F.least(
            (F.col("o_totalprice").cast("long") / F.lit(31250)).cast(
                "long"
            ),
            F.lit(15).cast("long"),
        ).alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("o_orderpriority") == "1-URGENT").cast("int")
        ).cast("long").alias("pos"),
    )
    # 16-row frame: both windows run over the FIXED band grid
    wc = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    pre = b.select(
        "band",
        F.sum("n").over(wc).alias("cn"),
        F.sum("pos").over(wc).alias("cp"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("pt"),
    )
    neg_l = F.col("cn") - F.col("cp")
    n_r = F.col("nt") - F.col("cn")
    pos_r = F.col("pt") - F.col("cp")
    neg_r = n_r - pos_r
    score = (
        (F.col("cp") * F.col("cp") + neg_l * neg_l).cast("double")
        / F.col("cn").cast("double")
        + (pos_r * pos_r + neg_r * neg_r).cast("double")
        / n_r.cast("double")
    )
    splits = pre.filter(n_r > 0).select(
        (F.col("band") + 1).alias("split_band"),
        F.col("cn").alias("n_left"),
        F.col("cp").alias("pos_left"),
        n_r.alias("n_right"),
        pos_r.alias("pos_right"),
        score.alias("score"),
    )
    wb = Window.orderBy(F.desc("score"), F.asc("split_band"))
    return (
        splits.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(
            "split_band", "n_left", "pos_left", "n_right", "pos_right",
            F.round("score", 6).alias("score"),
            F.round(
                F.col("pos_left").cast("double")
                / F.col("n_left").cast("double"),
                6,
            ).alias("rate_left"),
            F.round(
                F.col("pos_right").cast("double")
                / F.col("n_right").cast("double"),
                6,
            ).alias("rate_right"),
        )
    )


@register(
    "train_chunk_windows",
    # Overlapping sliding-window chunking (r14 — the RAG/context-window
    # shape the disjoint chunk_text paragraphs don't cover): windows of
    # 32 words every 16, word offsets carried so spans map back to the
    # source, last window reaching the document's end, every doc
    # emitting at least one window. Window counts are pure integer
    # arithmetic on both engines; chunk CONTENT is hashed (md5) so the
    # compare proves every chunk's exact text without shipping it.
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
      FROM documents
    ),
    wins AS (
      SELECT doc_id, w, n,
             unnest(generate_series(
               0, (1 + (greatest(n - 32, 0) + 15) // 16) - 1)) AS win_id
      FROM w
    )
    SELECT doc_id,
           CAST(win_id AS BIGINT) AS win_id,
           CAST(win_id * 16 AS BIGINT) AS start_word,
           CAST(least(32, n - win_id * 16) AS BIGINT) AS n_words,
           md5(array_to_string(w[win_id*16 + 1 : win_id*16 + 32], ' '))
             AS chunk_md5
    FROM wins
    """,
)
def train_chunk_windows(spark, sf_dir):
    from ..operators.training import chunk_text_windows

    docs = load_table(spark, sf_dir, "documents")
    return chunk_text_windows(
        docs, window_words=32, stride_words=16
    ).select(
        "doc_id",
        "win_id",
        "start_word",
        "n_words",
        F.md5("chunk").alias("chunk_md5"),
    )
