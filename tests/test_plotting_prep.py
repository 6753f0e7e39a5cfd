"""Plot-prep pipeline tests (SURVEY §3.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.plans.plotting_prep import (
    annotate_positions_with_regions,
    display_labels,
    prepare_top_n,
    stack_proteins,
    subset_to_top_n,
)


@pytest.fixture(scope="module")
def ts_long(spark):
    return spark.createDataFrame(
        [
            ("Spike", "D614G", 614, 10, 100),
            ("Spike", "D614G", 614, 30, 200),
            ("Spike", "N501Y", 501, 5, 100),
            ("Spike", "A222V", 222, 25, 200),
            ("NSP5", "K90R", 90, 8, 100),
        ],
        "protein string, key string, position int, freq long, total long",
    )


def test_top_n_by_frequency(ts_long):
    top = prepare_top_n(ts_long, n=2, by="frequency")
    rows = {r["key"]: r["rank"] for r in top.collect()}
    assert rows == {"D614G": 1, "A222V": 2}


def test_top_n_by_prevalence(ts_long):
    top = prepare_top_n(ts_long, n=2, by="prevalence", total_col="total")
    rows = {r["key"]: r["rank"] for r in top.collect()}
    # D614G 40/300, A222V 25/200=0.125, D614G 0.133 → D614G first
    assert rows["D614G"] == 1
    assert rows["A222V"] == 2


def test_subset_preserves_rank(ts_long):
    top = prepare_top_n(ts_long, n=1)
    sub = subset_to_top_n(ts_long, top)
    assert {r["key"] for r in sub.collect()} == {"D614G"}
    assert all(r["rank"] == 1 for r in sub.collect())


def test_region_annotation_and_labels(spark, ts_long):
    regions = spark.createDataFrame(
        [("NTD", 1, 305, 1), ("RBD", 319, 541, 2)],
        "name string, start int, end int, priority int",
    )
    annotated = annotate_positions_with_regions(ts_long, regions, "position")
    rows = {(r["key"]): r["region_name"] for r in annotated.collect()}
    assert rows["N501Y"] == "RBD"
    assert rows["A222V"] == "NTD"
    assert rows["D614G"] == "Other"  # uncovered position

    labeled = display_labels(annotated)
    lab = {r["key"]: r["label"] for r in labeled.collect()}
    assert lab["N501Y"] == "Spike: N501Y (RBD)"


def test_stack_proteins_missing_columns(spark, ts_long):
    extra = spark.createDataFrame(
        [("ORF3a", "S26L", 7)], "protein string, key string, freq long"
    )
    stacked = stack_proteins([ts_long, extra])
    assert stacked.count() == 6
    row = stacked.filter(F.col("protein") == "ORF3a").first()
    assert row["position"] is None  # missing column null-filled
