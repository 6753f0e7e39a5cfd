"""End-to-end Time_Series pipeline test (SURVEY §3.2) over genomics-shaped
inline fixtures: clusters TSV shape → metadata join → kernel variant lists
→ weekly frequency/percentage matrices."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.timeseries import (
    weekly_percentage,
    with_week_labels,
)
from gisaid_pipeline_functions_spark.operators.variant_caller import call_variants
from gisaid_pipeline_functions_spark.plans.time_series import (
    link_and_clean,
    orphan_clusters,
    prepare_metadata,
    top_combinations,
    variant_list_by_cluster,
)

D = datetime.date


@pytest.fixture(scope="module")
def pipeline(spark):
    clusters = spark.createDataFrame(
        [
            ("Spike|x|2020-03-01|EPI_1|a|b|Human", "Uniq1", 1, 1, 3, "t"),
            ("Spike|x|2020-03-02|EPI_2|a|b|Human", "Uniq1", 1, 2, 3, "t"),
            ("Spike|x|2020-03|EPI_3|a|b|Human", "Uniq1", 1, 3, 3, "t"),
            ("Spike|x|2020-03-08|EPI_4|a|b|Human", "Uniq2", 2, 1, 2, "t"),
            ("Spike|x|2020-03-15|EPI_5|a|b|Human", "Uniq2", 2, 2, 2, "t"),
            ("Spike|x|2020-03-20|EPI_6|a|b|Human", "Uniq3", 3, 1, 1, "t"),  # singleton
        ],
        "Input_ID string, Cluster_Name string, Cluster_num long, Member_num long, Cluster_Size long, Target_Seq string",
    )
    metadata = spark.createDataFrame(
        [
            ("EPI_1", "2020-03-01", "Europe"),
            ("EPI_2", "2020-03-02", "Asia"),
            ("EPI_3", "2020-03", "Europe"),      # partial date → dropped by F3
            ("EPI_4", "2020-03-08", "Europe"),
            ("EPI_5", "2020-03-15", "Europe"),
            ("EPI_6", "2020-03-20", "Oceania"),  # singleton → dropped by F2
        ],
        "gisaid_epi_isl string, date string, region string",
    )
    aligned = spark.createDataFrame(
        [
            ("Spike", "Uniq1", 3, "MSKTPAQTLV"),  # sub L4T
            ("Spike", "Uniq2", 2, "MSK-PAQTLV"),  # del L4del
        ],
        "protein string, cluster_id string, cluster_size long, aligned_seq string",
    )
    variants = call_variants(aligned, {"Spike": "MSKLPAQTLV"})

    meta = prepare_metadata(clusters, metadata)
    lists = variant_list_by_cluster(variants, ref_cluster="UniqRef")
    linked = link_and_clean(meta, lists)
    return meta, lists, linked


def test_prepare_metadata_filters_and_joins(pipeline):
    meta, _, _ = pipeline
    rows = {r["gisaid_epi_isl"]: r for r in meta.collect()}
    assert set(rows) == {"EPI_1", "EPI_2", "EPI_3", "EPI_4", "EPI_5"}  # no singleton
    assert rows["EPI_1"]["Cluster_Name"] == "Uniq1"


def test_variant_lists_and_aa_changes(pipeline):
    _, lists, _ = pipeline
    rows = {r["Cluster_ID"]: r for r in lists.collect()}
    assert rows["Uniq1"]["Variants"] == ["L4T"]
    assert rows["Uniq1"]["AA_Changes"] == 1
    assert rows["Uniq2"]["Variants"] == ["L4del"]
    assert rows["UniqRef"]["Variants"] == []
    assert rows["UniqRef"]["Number_of_Variants"] == 0


def test_link_and_clean_drops_partial_dates(pipeline):
    _, _, linked = pipeline
    rows = {r["gisaid_epi_isl"]: r for r in linked.collect()}
    assert set(rows) == {"EPI_1", "EPI_2", "EPI_4", "EPI_5"}
    assert rows["EPI_1"]["date"] == D(2020, 3, 1)
    assert rows["EPI_1"]["Variants"] == ["L4T"]


def test_orphan_check(pipeline, spark):
    meta, lists, _ = pipeline
    assert orphan_clusters(meta, lists).count() == 0
    # remove Uniq2's list → EPI_4/EPI_5 become orphans
    broken = lists.filter(F.col("Cluster_ID") != "Uniq2")
    assert orphan_clusters(meta, broken).count() == 1


def test_weekly_freq_and_percentage(pipeline):
    _, _, linked = pipeline
    exploded = linked.select("date", F.explode("Variants").alias("key"))
    from gisaid_pipeline_functions_spark.operators.timeseries import weekly_frequency

    freq = weekly_frequency(exploded, "date", "key")
    rows = {(r["week_start"], r["key"]): r["freq"] for r in freq.collect()}
    # 2020-03-01 is a Sunday → weeks anchor on the 1st, 8th, 15th
    assert rows[(D(2020, 3, 1), "L4T")] == 2
    assert rows[(D(2020, 3, 8), "L4del")] == 1
    assert rows[(D(2020, 3, 15), "L4del")] == 1

    pct = {(r["week_start"], r["key"]): r["pct"] for r in weekly_percentage(freq).collect()}
    assert pct[(D(2020, 3, 1), "L4T")] == 1.0

    labeled = with_week_labels(freq)
    labels = {r["week_start"]: r["week_label"] for r in labeled.collect()}
    assert labels[D(2020, 3, 1)] == "Week1 (03/01/2020-03/07/2020)"
    assert labels[D(2020, 3, 15)] == "Week3 (03/15/2020-03/21/2020)"


def test_top_combinations(pipeline):
    _, lists, _ = pipeline
    rows = top_combinations(lists, n=2).collect()
    assert rows[0]["Cluster_ID"] == "Uniq1"
    assert rows[0]["Combination"] == "L4T"
    assert rows[0]["Cluster_Size"] == 3
