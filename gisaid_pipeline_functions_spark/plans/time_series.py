"""The Time_Series pipeline (SURVEY §3.2) — metadata joins + weekly
frequency/percentage matrices, composed Spark-first.

Stage map (reference /root/reference/Time_Series.py):
  Step 1 prepare_metadata (469–500)        → `prepare_metadata`
  Step 2 variant_list_by_cluster (502–565) → `variant_list_by_cluster`
  Step 2a find_top_combinations (567–585)  → `top_combinations`
  Step 3 link + clean (613–675)            → `link_and_clean`
  Step 3a/4/5 weekly tables (731–987)      → operators.timeseries (W2–W5)

The reference loops protein × continent × week, rescanning per iteration;
here `protein` is a column, the continent loop is a rollup, and weeks are
a derived column — each table is one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_metadata(
    clusters: DataFrame, metadata: DataFrame, min_cluster_size: int = 2
) -> DataFrame:
    """Step 1 (Time_Series.py:469–500): drop singleton clusters (F2),
    extract the accession from the ``|``-delimited Input_ID (P3, field 3),
    inner-join to metadata on the accession (J1).

    Both sides are large → the join shuffles on ``gisaid_epi_isl``; the
    filter and the two-column projection happen BEFORE the join so
    Catalyst pushes them into the scans."""
    clustmap = (
        clusters.filter(F.col("Cluster_Size") >= min_cluster_size)
        .select(
            F.split(F.col("Input_ID"), "\\|").getItem(3).alias("gisaid_epi_isl"),
            F.col("Cluster_Name"),
            F.col("Cluster_Size"),
        )
    )
    return metadata.join(clustmap, "gisaid_epi_isl", "inner")


def aa_change_weights(variants: DataFrame) -> DataFrame:
    """Per-code amino-acid-change weight (Time_Series.py:393–467), computed
    ONCE per distinct code with native string functions — replaces the
    reference's per-cluster-per-code pandas subset loop:

    sub → 1; single del/ext → 1; multi del → #ref residues;
    ins / multi ext → #var residues; delins → #ref + #var residues."""
    nongap = lambda c: F.length(F.regexp_replace(F.coalesce(c, F.lit("")), "-", ""))
    w = (
        F.when(F.col("Type") == "sub", F.lit(1))
        .when(
            F.col("Type") == "del",
            F.when(F.col("AA_End_MSA").isNull(), F.lit(1)).otherwise(
                nongap(F.col("Ref_Residues"))
            ),
        )
        .when(F.col("Type") == "ins", nongap(F.col("Var_Residues")))
        .when(
            F.col("Type") == "delins",
            nongap(F.col("Var_Residues")) + nongap(F.col("Ref_Residues")),
        )
        .when(
            F.col("Type") == "ext",
            F.when(F.col("AA_End_MSA").isNull(), F.lit(1)).otherwise(
                nongap(F.col("Var_Residues"))
            ),
        )
    )
    return (
        variants.groupBy("Code")
        .agg(
            F.first("Type").alias("Type"),
            F.first("AA_End_MSA").alias("AA_End_MSA"),
            F.first("Ref_Residues").alias("Ref_Residues"),
            F.first("Var_Residues").alias("Var_Residues"),
        )
        .select("Code", w.cast("long").alias("aa_change_weight"))
    )


def variant_list_by_cluster(
    variants: DataFrame, ref_cluster: str | None = None
) -> DataFrame:
    """Step 2 (Time_Series.py:502–565): collect the variant codes per
    cluster (A1, ordered by MSA start for distributed determinism), append
    the reference cluster with an empty list (U2, :543–545), and attach
    ``Number_of_Variants`` + ``AA_Changes`` (P4, via the broadcast weight
    table instead of a per-row pandas apply)."""
    per_cluster = variants.groupBy("Cluster_ID").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("AA_Start_MSA", "Code"))),
            lambda s: s["Code"],
        ).alias("Variants"),
        F.first("Cluster_Size").alias("Cluster_Size"),
    )
    if ref_cluster is not None:
        spark = variants.sparkSession
        ref_row = spark.createDataFrame(
            [(ref_cluster, [], None)],
            "Cluster_ID string, Variants array<string>, Cluster_Size long",
        )
        per_cluster = per_cluster.unionByName(ref_row)

    weights = aa_change_weights(variants)
    exploded = per_cluster.select(
        "Cluster_ID", F.explode_outer("Variants").alias("Code")
    )
    changes = (
        exploded.join(F.broadcast(weights), "Code", "left")
        .groupBy("Cluster_ID")
        .agg(F.sum(F.coalesce("aa_change_weight", F.lit(0))).alias("AA_Changes"))
    )
    return (
        per_cluster.join(changes, "Cluster_ID")
        .withColumn("Number_of_Variants", F.size("Variants").cast("long"))
    )


def top_combinations(cluster_lists: DataFrame, n: int = 10) -> DataFrame:
    """Step 2a (Time_Series.py:567–585): largest clusters with their full
    variant combination; deterministic tie-break on cluster id."""
    return (
        cluster_lists.select(
            "Cluster_ID",
            F.array_join("Variants", ",").alias("Combination"),
            "Number_of_Variants",
            "Cluster_Size",
        )
        .orderBy(F.desc_nulls_last("Cluster_Size"), F.asc("Cluster_ID"))
        .limit(n)
    )


def link_and_clean(
    meta: DataFrame,
    cluster_lists: DataFrame,
    cluster_col: str = "Cluster_Name",
    date_col: str = "date",
) -> DataFrame:
    """Step 3 (Time_Series.py:613–675): left-join variant lists onto the
    per-sequence metadata (J2 — the list side is small → broadcast), keep
    only full ISO dates (F3, :632–635), cast to date, null-fill lists with
    empty arrays and counts with 0 (:657–661).

    Returns one row per sequence: (accession, region, date, Variants,
    Number_of_Variants, ...)."""
    linked = meta.join(
        F.broadcast(
            cluster_lists.select(
                F.col("Cluster_ID").alias(cluster_col),
                "Variants",
                "Number_of_Variants",
                "AA_Changes",
            )
        ),
        cluster_col,
        "left",
    )
    cleaned = (
        linked.filter(F.col(date_col).rlike(r"^\d{4}-\d{2}-\d{2}$"))
        .withColumn(date_col, F.to_date(date_col))
        .withColumn("Variants", F.coalesce("Variants", F.array().cast("array<string>")))
        .withColumn("Number_of_Variants", F.coalesce("Number_of_Variants", F.lit(0)))
        .withColumn("AA_Changes", F.coalesce("AA_Changes", F.lit(0)))
    )
    return cleaned


def orphan_clusters(meta: DataFrame, cluster_lists: DataFrame, cluster_col: str = "Cluster_Name") -> DataFrame:
    """F13 (Time_Series.py:619–622): clusters present in the metadata join
    but missing a variant list — a data-quality anti-join the reference
    only warns about; returned as a DataFrame so callers can assert
    ``count() == 0``."""
    return meta.join(
        cluster_lists.select(F.col("Cluster_ID").alias(cluster_col)),
        cluster_col,
        "left_anti",
    ).select(cluster_col).distinct()
