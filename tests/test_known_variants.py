"""Showcase integration fixture: the well-known SARS-CoV-2 Spike variant
mutations, called correctly from a miniature alignment.

Positions are compressed into a short synthetic reference, but each case
reproduces the exact HGVS code *shape* the real pipeline emits for the
famous lineage mutations: D614G (Wuhan→G clade substitution), the Alpha
H69_V70del double deletion, N501Y, E484K, and the Omicron ins214EPE
insertion."""

from __future__ import annotations

import pytest

from gisaid_pipeline_functions_spark.operators.variant_caller import (
    call_variants,
    mutation_count_table,
)

#             position:  123456789...
#  compressed reference: D at 1 stands in for D614, HV at 3-4 for H69/V70,
#  N at 6 for N501, E at 8 for E484, R|D at 9-10 flank the ins site
REF = "DAHVQNAER-D"  # '-' column = insertion site (ref gap)


@pytest.fixture(scope="module")
def called(spark):
    aligned = spark.createDataFrame(
        [
            ("Spike", "G_clade", 1000, "GAHVQNAER-D"),   # D1G  (≙ D614G)
            ("Spike", "Alpha", 500, "DA--QYAER-D"),      # H3_V4del + N6Y (≙ 69-70del, N501Y)
            ("Spike", "Beta", 200, "DAHVQNAKR-D"),       # E8K  (≙ E484K)
            ("Spike", "Omicron", 800, "GA--QYAKRED"),    # all + ins (≙ ins214EPE shape)
            ("Spike", "Wuhan", 100, "DAHVQNAER-D"),      # reference-identical
        ],
        "protein string, cluster_id string, cluster_size long, aligned_seq string",
    )
    return call_variants(aligned, {"Spike": REF})


def test_known_codes(called):
    by_cluster = {}
    for r in called.collect():
        by_cluster.setdefault(r["Cluster_ID"], []).append(r["Code"])
    assert by_cluster["G_clade"] == ["D1G"]
    assert sorted(by_cluster["Alpha"]) == ["H3_V4del", "N6Y"]
    assert by_cluster["Beta"] == ["E8K"]
    assert sorted(by_cluster["Omicron"]) == ["D1G", "E8K", "H3_V4del", "N6Y", "R9_D10insE"]
    assert "Wuhan" not in by_cluster  # no variants for the reference strain


def test_frequencies_weighted_by_cluster_size(called):
    table = mutation_count_table(called, ref_length=10, total_seq=2600)
    rows = {r["Residue_Number"]: r for r in table.collect()}
    # D1G carried by G_clade (1000) + Omicron (800)
    assert rows[1]["Substitutions"] == 1800
    # the double deletion explodes onto residues 3 AND 4 (break_up_del)
    assert rows[3]["Deletions"] == 1300
    assert rows[4]["Deletions"] == 1300
    # N6Y by Alpha + Omicron
    assert rows[6]["Substitutions"] == 1300
    # untouched positions present with zeros
    assert rows[5]["Total_Variants"] == 0
