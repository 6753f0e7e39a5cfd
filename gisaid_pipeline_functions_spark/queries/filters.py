"""Filter-family query registrations (SURVEY §2.4, §2.6 A8/A12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.filters import bucket_histogram, quality_filter_tally
from ..registry import register
from ..sources.tables import load_table


@register(
    "filter_quality_tally",
    # Reference Sequence_Filter.py:92–156 — branch order matters (first
    # failing test is the recorded reason).
    """
    SELECT reason, count(*) AS n FROM (
      SELECT CASE
        WHEN lang <> 'en' THEN 'wrong_lang'
        WHEN n_chars < 100 THEN 'too_short'
        WHEN n_chars >= 1500 THEN 'too_long'
        WHEN (length(text) - length(replace(text, 'x', ''))) * 1.0
             / length(text) > 0.05 THEN 'too_ambiguous'
        ELSE 'pass' END AS reason
      FROM documents
    ) GROUP BY reason
    """,
)
def filter_quality_tally(spark, sf_dir):
    return quality_filter_tally(load_table(spark, sf_dir, "documents"))


@register(
    "filter_regex",
    # F3 ISO-date-regex analog (Time_Series.py:625–639): regex row filter
    # + per-key count.
    """
    SELECT event_type, count(*) AS n
    FROM events
    WHERE regexp_matches(props, '"k": [0-9]{2}\\}')
    GROUP BY event_type
    """,
)
def filter_regex(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("props").rlike('"k": [0-9]{2}\\}'))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "filter_membership",
    # F6 — isin subset (Plotting_Functions.py:45–49).
    """
    SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    GROUP BY l_returnflag
    """,
)
def filter_membership(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "filter_bucket_histogram",
    # A8/F9 — uneven bins + overflow + percentage (Seq_Tools.py:113–155).
    """
    WITH b AS (
      SELECT CASE
        WHEN o_totalprice < 1000 THEN '<1000'
        WHEN o_totalprice >= 1000 AND o_totalprice < 5000 THEN '[1000,5000)'
        WHEN o_totalprice >= 5000 AND o_totalprice < 20000 THEN '[5000,20000)'
        WHEN o_totalprice >= 20000 AND o_totalprice < 50000 THEN '[20000,50000)'
        ELSE '>=50000' END AS bucket
      FROM orders
    ), c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
    SELECT bucket, n, round(n * 1.0 / sum(n) OVER (), 6) AS pct FROM c
    """,
)
def filter_bucket_histogram(spark, sf_dir):
    return bucket_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", [1000, 5000, 20000, 50000]
    )


@register(
    "filter_motif_substring",
    # F12 — aligned-slice motif equality (alignment_tools.py:62–68).
    """
    SELECT lang, count(*) AS n
    FROM documents WHERE substr(text, 1, 4) = 'the '
    GROUP BY lang
    """,
)
def filter_motif_substring(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.substring("text", 1, 4) == "the ")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "filter_x_content",
    # A12 — per-row ambiguity fraction count(ch)/len (Seq_Tools.py:18–34),
    # as a scalar expression (no UDF), thresholded like Sequence_Filter.py:130.
    """
    SELECT doc_id,
           round((length(text) - length(replace(text, 'e', ''))) * 1.0
                 / length(text), 6) AS x_ratio
    FROM documents
    WHERE (length(text) - length(replace(text, 'e', ''))) * 1.0
          / length(text) > 0.04
    """,
)
def filter_x_content(spark, sf_dir):
    from ..functions.strings import x_content

    docs = load_table(spark, sf_dir, "documents")
    ratio = x_content(F.col("text"), "e")
    return docs.filter(ratio > 0.04).select(
        "doc_id", F.round(ratio, 6).alias("x_ratio")
    )


@register(
    "filter_singleton_exclusion",
    # F2 — drop single-member groups before analysis (the reference
    # excludes variants seen once, Time_Series.py singleton rule): one
    # grouped pass with a HAVING, never a per-group subquery loop.
    """
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
)
def filter_singleton_exclusion(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") > 1)
    )


@register(
    "filter_reference_clusters",
    # F10 — the R-script regex row filter + check_equal consistency rule
    # (plans/reference_clusters.py:find_reference_clusters; reference
    # Find_Reference_Clusters.R:51–53 greps each cluster file for the
    # reference header, :56–101 keeps the cluster only when every match
    # agrees). Mapped onto testdata: protein := c_mktsegment, Input_ID :=
    # c_name, Cluster_Name := 'C' || c_custkey % 10; the '4[17]$' pattern
    # hits names ending 41/47, so segments split three ways — unique
    # cluster (resolved), conflicting clusters (NULL), no match (NULL) —
    # exercising every branch of the rule.
    """
    WITH clusters AS (
      SELECT c_mktsegment AS protein, c_name AS input_id,
             'C' || CAST(c_custkey % 10 AS VARCHAR) AS cluster_name
      FROM customer
    ),
    m AS (
      SELECT protein, count(DISTINCT cluster_name) AS nd,
             min(cluster_name) AS cand
      FROM clusters WHERE regexp_matches(input_id, '4[17]$')
      GROUP BY protein
    )
    SELECT p.protein,
           CASE WHEN m.nd = 1 THEN m.cand END AS ref_cluster_name
    FROM (SELECT DISTINCT protein FROM clusters) p
    LEFT JOIN m ON p.protein = m.protein
    """,
)
def filter_reference_clusters(spark, sf_dir):
    from ..plans.reference_clusters import find_reference_clusters

    cust = load_table(spark, sf_dir, "customer")
    clusters = cust.select(
        F.col("c_mktsegment").alias("protein"),
        F.col("c_name").alias("Input_ID"),
        F.concat(F.lit("C"), (F.col("c_custkey") % 10).cast("string")).alias(
            "Cluster_Name"
        ),
    )
    return find_reference_clusters(clusters, "4[17]$")
