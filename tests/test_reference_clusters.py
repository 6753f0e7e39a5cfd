"""Find_Reference_Clusters.R parity tests (S7/F10/check_equal)."""

from __future__ import annotations

import pytest

from gisaid_pipeline_functions_spark.plans.reference_clusters import (
    find_reference_clusters,
    read_where_reference,
)


@pytest.fixture(scope="module")
def clusters(spark):
    return spark.createDataFrame(
        [
            # Spike: reference appears twice, same cluster → resolves
            ("Spike", "Spike|hCoV-19/Wuhan/WIV04/2019|EPI_ISL_402124", "Uniq1"),
            ("Spike", "Spike|hCoV-19/Wuhan/WIV04/2019|EPI_ISL_402124", "Uniq1"),
            ("Spike", "Spike|hCoV-19/other|EPI_ISL_9", "Uniq2"),
            # NSP5: reference in TWO different clusters → ambiguous → NULL
            ("NSP5", "NSP5|hCoV-19/Wuhan/WIV04/2019|EPI_ISL_402124", "Uniq3"),
            ("NSP5", "NSP5|hCoV-19/Wuhan/WIV04/2019|EPI_ISL_402124", "Uniq4"),
            # NSP12: reference absent → NULL row still emitted
            ("NSP12", "NSP12|hCoV-19/other|EPI_ISL_8", "Uniq5"),
        ],
        "protein string, Input_ID string, Cluster_Name string",
    )


def test_resolution_rules(clusters):
    out = {
        r["protein"]: r["ref_cluster_name"]
        for r in find_reference_clusters(clusters, "WIV04").collect()
    }
    assert out == {"Spike": "Uniq1", "NSP5": None, "NSP12": None}


def test_where_reference_roundtrip(spark, clusters, tmp_path):
    out_df = find_reference_clusters(clusters, "WIV04").na.fill(
        "NA", ["ref_cluster_name"]
    )
    p = tmp_path / "where_reference.tsv"
    pdf = out_df.toPandas()
    pdf.to_csv(p, sep="\t", header=False, index=False)
    lookup = read_where_reference(spark, str(p))
    assert lookup == {"Spike": "Uniq1"}  # NA rows filtered out
