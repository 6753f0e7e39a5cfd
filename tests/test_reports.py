"""Report-generation tests (SURVEY §3.1 Parts 2–3, K6 text sinks)."""

from __future__ import annotations

import pytest

from gisaid_pipeline_functions_spark.operators.variant_caller import call_variants
from gisaid_pipeline_functions_spark.plans.reports import (
    cluster_report_text,
    clusters_by_code,
    code_report_text,
    mutation_csv,
    variants_by_cluster,
    write_report,
)


@pytest.fixture(scope="module")
def variants_df(spark):
    aligned = spark.createDataFrame(
        [
            ("S", "Uniq2", 5, "MSKTPAQTLV"),   # sub L4T
            ("S", "Uniq10", 3, "MSKTPAQTLV"),  # same sub, different cluster
            ("S", "Uniq1", 10, "MSK-PAQTLV"),  # del L4del
            ("S", "Uniq1", 10, "MSK-PAQTLV"),  # (same row twice is fine)
        ],
        "protein string, cluster_id string, cluster_size long, aligned_seq string",
    ).dropDuplicates(["cluster_id", "aligned_seq"])
    return call_variants(aligned, {"S": "MSKLPAQTLV"})


def test_variants_by_cluster_natural_sort(variants_df):
    rows = variants_by_cluster(variants_df).orderBy("nat_key").collect()
    # natural order: Uniq1 < Uniq2 < Uniq10 (lexicographic would put 10 first)
    assert [r["Cluster_ID"] for r in rows] == ["Uniq1", "Uniq2", "Uniq10"]
    assert rows[1]["codes"] == ["L4T"]


def test_clusters_by_code_groups_and_totals(variants_df):
    rows = clusters_by_code(variants_df, "sub").collect()
    assert len(rows) == 1
    assert rows[0]["Code"] == "L4T"
    assert rows[0]["total_seq"] == 8  # 5 + 3
    assert rows[0]["members"] == ["Uniq2; 5 sequences", "Uniq10; 3 sequences"] or rows[
        0
    ]["members"] == ["Uniq10; 3 sequences", "Uniq2; 5 sequences"]


def test_mutation_csv_shape(variants_df):
    rows = mutation_csv(variants_df, total_prot_seq=18).collect()
    by_code = {r["Code"]: r for r in rows}
    assert by_code["L4T"]["Frequency"] == 8
    assert by_code["L4T"]["Position"] == 4
    assert by_code["L4T"]["Percentage"] == f"{round(8*100.0/18, 4):.4f}%"
    assert by_code["L4del"]["Frequency"] == 10


def test_report_text_files(variants_df, tmp_path):
    p = str(tmp_path / "clusters.txt")
    write_report(
        cluster_report_text(variants_df), p, "Variants observed by cluster", "-" * 30
    )
    content = open(p).read()
    assert content.startswith("-" * 30 + "\nVariants observed by cluster\n")
    assert ">Uniq1, 10 sequences\nL4del" in content
    # natural-sorted block order
    assert content.index(">Uniq2") < content.index(">Uniq10")

    p2 = str(tmp_path / "subs.txt")
    write_report(
        code_report_text(variants_df, "sub"),
        p2,
        "Clusters by Mutation Code: Substitutions",
    )
    c2 = open(p2).read()
    assert ">L4T, 8 sequences" in c2
    assert "Uniq2; 5 sequences" in c2
