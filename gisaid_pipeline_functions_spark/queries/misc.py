"""Projection / union / funnel / report query registrations
(SURVEY §2.3 P3/P7/P8, §2.9 U1/U2, §2.5 J8, §2.6 A13, §3.1 Part 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table


@register(
    "proj_split_extract",
    # P3 — split-on-delimiter + field index, the reference's workhorse
    # (Time_Series.py:375–385: accession = header field 3).
    """
    SELECT o_orderkey,
           string_split(o_orderpriority, '-')[1] AS prio_num,
           string_split(o_orderpriority, '-')[2] AS prio_word
    FROM orders
    """,
)
def proj_split_extract(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    parts = F.split("o_orderpriority", "-")
    return o.select(
        "o_orderkey",
        parts.getItem(0).alias("prio_num"),
        parts.getItem(1).alias("prio_word"),
    )


@register(
    "proj_display_label",
    # P7 — "<protein>: <code> (<region>)" display-label composition
    # (Plotting_Functions.py:247–298).
    """
    SELECT p_partkey,
           format('{}: {} ({})', p_brand, p_name, p_type) AS label
    FROM part
    """,
)
def proj_display_label(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s: %s (%s)", "p_brand", "p_name", "p_type").alias("label"),
    )


@register(
    "proj_type_label_map",
    # P8 — short→long label via map lookup, NULL on unknown key
    # (Plotting_Functions.py:1334–1354 raises on miss; we surface NULL and
    # let the caller assert, F13-style).
    """
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'Finished'
                              WHEN 'O' THEN 'Open'
                              WHEN 'P' THEN 'Pending' END AS status_label
    FROM orders
    """,
)
def proj_type_label_map(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("F"), F.lit("Finished"),
        F.lit("O"), F.lit("Open"),
        F.lit("P"), F.lit("Pending"),
    )
    return o.select("o_orderkey", m[F.col("o_orderstatus")].alias("status_label"))


@register(
    "union_stack_tables",
    # U1 — vertical concat of per-protein tables with missing columns
    # (Plotting_Functions.py:339–386 → unionByName(allowMissingColumns)).
    """
    SELECT 'customer' AS src, c_name AS name, c_acctbal AS acctbal, NULL AS nation
    FROM customer WHERE c_acctbal > 9000
    UNION ALL BY NAME
    SELECT 'supplier' AS src, s_name AS name, s_acctbal AS acctbal,
           CAST(s_nationkey AS VARCHAR) AS nation
    FROM supplier
    """,
)
def union_stack_tables(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.lit("customer").alias("src"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("string").alias("nation"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "union_synthetic_rows",
    # U2 — append synthetic rows (the reference cluster's empty-list row,
    # Time_Series.py:543–545).
    """
    SELECT event_type AS key, count(*) AS n FROM events GROUP BY event_type
    UNION ALL
    SELECT 'Total_Events' AS key, count(*) AS n FROM events
    """,
)
def union_synthetic_rows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = ev.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("Total_Events").alias("key"), "n"
    )
    return per_type.unionByName(total)


@register(
    "funnel_stage_counts",
    # J8/A13 — the Sequence_Counter funnel: per-key counts at each pipeline
    # stage, aligned on the key (Sequence_Counter.py:19–113). Stages here:
    # all docs → length-pass → lang-en → final quality pass.
    """
    WITH s1 AS (SELECT source, count(*) AS n_all FROM documents GROUP BY source),
    s2 AS (SELECT source, count(*) AS n_len FROM documents
           WHERE n_chars >= 100 AND n_chars < 1500 GROUP BY source),
    s3 AS (SELECT source, count(*) AS n_en FROM documents
           WHERE n_chars >= 100 AND n_chars < 1500 AND lang = 'en' GROUP BY source),
    s4 AS (SELECT source, count(*) AS n_pass FROM documents
           WHERE n_chars >= 100 AND n_chars < 1500 AND lang = 'en'
             AND (length(text) - length(replace(text, 'x', ''))) * 1.0
                 / length(text) <= 0.05
           GROUP BY source)
    SELECT s1.source, s1.n_all,
           coalesce(s2.n_len, 0) AS n_len,
           coalesce(s3.n_en, 0) AS n_en,
           coalesce(s4.n_pass, 0) AS n_pass
    FROM s1
    LEFT JOIN s2 ON s1.source = s2.source
    LEFT JOIN s3 ON s1.source = s3.source
    LEFT JOIN s4 ON s1.source = s4.source
    """,
)
def funnel_stage_counts(spark, sf_dir):
    # Spark-first: ONE pass with conditional aggregation — the reference's
    # five directory re-scans collapse into four counters over one scan.
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.strings import count_occurrences

    len_ok = (F.col("n_chars") >= 100) & (F.col("n_chars") < 1500)
    en_ok = len_ok & (F.col("lang") == "en")
    ratio = count_occurrences(F.col("text"), "x") / F.length("text")
    pass_ok = en_ok & (ratio <= 0.05)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(len_ok.cast("long")).alias("n_len"),
        F.sum(en_ok.cast("long")).alias("n_en"),
        F.sum(pass_ok.cast("long")).alias("n_pass"),
    )


@register(
    "bucket_selection_strings",
    # F9 + Pymol_Strings.py:14–25, 60–84: bucket keys by count range, then
    # emit a '+'-joined selection string per bucket; completeness is
    # guaranteed by the exhaustive CASE.
    """
    WITH counts AS (
      SELECT l_partkey AS key, CAST(sum(l_quantity) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    ), bucketed AS (
      SELECT key, CASE
        WHEN n >= 2000 THEN 'vhigh' WHEN n >= 1000 THEN 'high'
        WHEN n >= 500 THEN 'mid' WHEN n > 0 THEN 'low'
        ELSE 'zero' END AS bucket
      FROM counts
    )
    SELECT bucket, count(*) AS n_keys,
           array_to_string(list_sort(list(CAST(key AS VARCHAR))), '+') AS selection
    FROM bucketed GROUP BY bucket
    """,
)
def bucket_selection_strings(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.sum("l_quantity").cast("long").alias("n")
    )
    bucket = (
        F.when(F.col("n") >= 2000, "vhigh")
        .when(F.col("n") >= 1000, "high")
        .when(F.col("n") >= 500, "mid")
        .when(F.col("n") > 0, "low")
        .otherwise("zero")
    )
    return (
        counts.select("key", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("key").cast("string"))), "+"
            ).alias("selection"),
        )
    )


@register(
    "report_mutation_csv",
    # §3.1 Part 3 — mutation_csv over the substitution-only derived
    # alignment: per-code position/type/frequency/percentage
    # (MSA_Reader.py:968–1036). End-to-end through the REAL kernel on the
    # Spark side; independent SQL recomputation on the oracle side.
    """
    WITH seqs AS (
      SELECT doc_id, source,
             upper(substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, 60)) AS seq
      FROM documents
      WHERE length(regexp_replace(text, '[^a-z]', '', 'g')) >= 60
    ),
    refs AS (
      SELECT source, arg_min(seq, doc_id) AS ref_seq, min(doc_id) AS ref_id
      FROM seqs GROUP BY source
    ),
    pairs AS (
      SELECT s.source, s.doc_id, s.seq, r.ref_seq
      FROM seqs s JOIN refs r ON s.source = r.source AND s.doc_id <> r.ref_id
    ),
    total AS (SELECT count(*) AS n FROM pairs),
    pos AS (SELECT unnest(generate_series(1, 60)) AS i),
    subs AS (
      SELECT p.source,
             substr(p.ref_seq, CAST(i AS INT), 1) || i
               || substr(p.seq, CAST(i AS INT), 1) AS code,
             CAST(i AS BIGINT) AS position
      FROM pairs p CROSS JOIN pos
      WHERE substr(p.ref_seq, CAST(i AS INT), 1) <> substr(p.seq, CAST(i AS INT), 1)
    )
    SELECT s.source AS protein, s.position AS "Position", 'sub' AS "Type",
           s.code AS "Code", count(*) AS "Frequency",
           format('{:.4f}%', round(count(*) * 100.0 / (SELECT n FROM total), 4))
             AS "Percentage"
    FROM subs s GROUP BY s.source, s.position, s.code
    """,
)
def report_mutation_csv(spark, sf_dir):
    from ..operators.variant_caller import call_variants
    from ..plans.reports import mutation_csv
    from .variants import _derived_alignment

    aligned, refs = _derived_alignment(spark, sf_dir)
    total = aligned.count()
    variants = call_variants(aligned, refs)
    return mutation_csv(variants, total_prot_seq=total, group_cols=("protein",))


@register(
    "report_text_lines",
    # K6/F7 — the cluster report TEXT blocks themselves
    # (MSA_Reader.py:784–816's ``>cluster, N sequences`` + one-code-per-
    # line print), driver-gated: the Spark side runs the REAL kernel over
    # the gap-free derived alignment and builds the blocks with
    # plans/reports.py:cluster_report_text (concat + array_sort, all
    # native); the oracle rebuilds the identical strings from an
    # independent positional-compare substitution call.
    """
    WITH seqs AS (
      SELECT doc_id, source,
             upper(substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, 60)) AS seq
      FROM documents
      WHERE length(regexp_replace(text, '[^a-z]', '', 'g')) >= 60
    ),
    refs AS (
      SELECT source, arg_min(seq, doc_id) AS ref_seq, min(doc_id) AS ref_id
      FROM seqs GROUP BY source
    ),
    pairs AS (
      SELECT s.doc_id, s.seq, r.ref_seq
      FROM seqs s JOIN refs r ON s.source = r.source AND s.doc_id <> r.ref_id
    ),
    pos AS (SELECT unnest(generate_series(1, 60)) AS i),
    subs AS (
      SELECT p.doc_id,
             substr(p.ref_seq, CAST(i AS INT), 1) || i
               || substr(p.seq, CAST(i AS INT), 1) AS code,
             CAST(i AS BIGINT) AS position
      FROM pairs p CROSS JOIN pos
      WHERE substr(p.ref_seq, CAST(i AS INT), 1) <> substr(p.seq, CAST(i AS INT), 1)
    )
    SELECT '>' || CAST(doc_id AS VARCHAR) || ', 1 sequences' || chr(10)
           || array_to_string(list(code ORDER BY position, code), chr(10))
           || chr(10) AS value
    FROM subs GROUP BY doc_id
    """,
)
def report_text_lines(spark, sf_dir):
    from ..operators.variant_caller import call_variants
    from ..plans.reports import cluster_report_text
    from .variants import _derived_alignment

    aligned, refs = _derived_alignment(spark, sf_dir)
    return cluster_report_text(call_variants(aligned, refs))


@register(
    "sql_api_weekly_freq",
    # The pure-SQL entry point: the same W2 weekly frequency matrix driven
    # through spark.sql over registered views (sources/tables.py:
    # register_views) instead of the DataFrame API — Catalyst plans both
    # identically; this row proves the SQL surface stays in parity.
    """
    SELECT CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS week_start,
           event_type AS key, count(*) AS freq
    FROM events GROUP BY 1, 2
    """,
)
def sql_api_weekly_freq(spark, sf_dir):
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT date_sub(CAST(ts AS DATE), dayofweek(ts) - 1) AS week_start,
               event_type AS key, count(*) AS freq
        FROM events GROUP BY 1, 2
        """
    )


@register(
    "plan_udf_discipline",
    # §2.12 driver-gated: the no-row-at-a-time-Python-UDF discipline as a
    # HASHED claim, not just a pytest assertion. The Spark side physically
    # plans six representative queries (covering the kernel's mapInPandas,
    # packing's applyInPandas, the LSH joins, PQ's broadcast chain, and
    # the pure-native text scorer) and reports whether each plan is free
    # of BatchEvalPython (the row-at-a-time escape hatch; Arrow-batched
    # MapInPandas / FlatMapGroupsInPandas are the sanctioned vectorized
    # nodes). The oracle is the contract: every row must come back TRUE —
    # if anyone introduces a scalar Python UDF into these plans, the
    # driver hash flips.
    """
    SELECT * FROM (VALUES
      ('dedup_minhash_lsh', TRUE),
      ('flagship_weekly_prevalence_topn', TRUE),
      ('pack_sequences', TRUE),
      ('sim_pq_adc_topk', TRUE),
      ('text_quality_score', TRUE),
      ('variant_call_kernel', TRUE)
    ) AS t(query_name, row_udf_free)
    """,
)
def plan_udf_discipline(spark, sf_dir):
    from ..registry import queries as _all_queries

    names = [
        "dedup_minhash_lsh",
        "flagship_weekly_prevalence_topn",
        "pack_sequences",
        "sim_pq_adc_topk",
        "text_quality_score",
        "variant_call_kernel",
    ]
    qs = _all_queries()
    rows = []
    for n in sorted(names):
        plan = qs[n](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        rows.append((n, "BatchEvalPython" not in plan))
    return spark.createDataFrame(rows, "query_name string, row_udf_free boolean")


@register(
    "proj_json_extract",
    # Semi-structured column surface: the events.props JSON string parsed
    # with an EXPLICIT schema (from_json; inference over 100 TB of JSON
    # is a full extra pass, same stance as the JSONL source) and
    # aggregated on the extracted field. Oracle: DuckDB JSON extraction.
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(props->>'$.k' AS BIGINT)), 6) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def proj_json_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k long").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


@register(
    "filter_try_cast_tally",
    # Dirty-data robustness: a deterministically-poisoned numeric string
    # column (every 3rd row carries the unparseable priority label) runs
    # through try_cast — parse failures become NULLs to tally, never
    # task-killing exceptions; 100 TB of real TSV always contains rows
    # like these. Both engines build the identical string (integer →
    # varchar is format-stable cross-engine; float text is NOT) and apply
    # their TRY_CAST.
    """
    WITH raw AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
                  ELSE CAST(o_custkey AS VARCHAR) END AS val
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN TRY_CAST(val AS BIGINT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
           CAST(sum(TRY_CAST(val AS BIGINT)) AS BIGINT) AS sum_parsed
    FROM raw GROUP BY o_orderpriority
    """,
)
def filter_try_cast_tally(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority"))
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("val"),
    )
    parsed = F.expr("try_cast(val AS BIGINT)")
    return raw.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(parsed.isNull().cast("int")).cast("long").alias("n_bad"),
        F.sum(parsed).cast("long").alias("sum_parsed"),
    )
