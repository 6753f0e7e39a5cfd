"""Find-reference-clusters (parity with Find_Reference_Clusters.R) and the
where_reference lookup scan (SURVEY §2.1 S7, §2.4 F10, §5.1 check_equal).

The R script loops cluster-info files one at a time, grepping each for the
reference isolate's header. Here all proteins resolve in ONE grouped pass:
regex row filter → per-protein distinct matched clusters → the
check_equal consistency rule (Find_Reference_Clusters.R:56–101) expressed
as a conditional aggregate:

- exactly one distinct cluster (any match count) → that cluster
- zero matches, or matches across different clusters → NULL (the R
  script's "NA" sentinel, written as real NULL per the engine's "-"/NA
  normalization rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

WHERE_REFERENCE_SCHEMA = StructType(
    [
        StructField("protein", StringType()),
        StructField("ref_cluster_name", StringType()),
    ]
)


def find_reference_clusters(clusters: DataFrame, reference_id: str) -> DataFrame:
    """One row per protein: the cluster containing the reference isolate,
    or NULL when absent / ambiguous.

    ``clusters`` must carry a ``protein`` column (the R script recovers it
    from each filename; distributed, it's a partition column)."""
    matches = clusters.filter(F.col("Input_ID").rlike(reference_id))
    per_protein = matches.groupBy("protein").agg(
        F.count_distinct("Cluster_Name").alias("n_distinct"),
        F.min("Cluster_Name").alias("candidate"),
    )
    resolved = per_protein.select(
        "protein",
        F.when(F.col("n_distinct") == 1, F.col("candidate")).alias("ref_cluster_name"),
    )
    # proteins with NO match at all must still appear, with NULL (R writes
    # an "NA" row, Find_Reference_Clusters.R:78–81)
    all_proteins = clusters.select("protein").distinct()
    return all_proteins.join(resolved, "protein", "left")


def read_where_reference(spark: SparkSession, path: str) -> dict[str, str]:
    """S7 — the two-column headerless where_reference.tsv → a broadcastable
    protein→cluster dict (Time_Series.py:587–611; MSA_Reader.py:1249–1290).
    The R script's literal "NA" strings become absent entries."""
    df = spark.read.csv(path, sep="\t", header=False, schema=WHERE_REFERENCE_SCHEMA)
    return {
        r["protein"]: r["ref_cluster_name"]
        for r in df.collect()
        if r["ref_cluster_name"] is not None and r["ref_cluster_name"] != "NA"
    }
