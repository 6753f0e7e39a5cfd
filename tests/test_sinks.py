"""Sink round-trips: the '-' sentinel ↔ NULL rule (SURVEY §1.1.3, §7)."""

from __future__ import annotations

import glob

from gisaid_pipeline_functions_spark.operators.variant_caller import call_variants
from gisaid_pipeline_functions_spark.sources.tables import (
    read_tsv_all_string,
    write_tsv_with_sentinel,
)


def test_variants_tsv_sentinel_roundtrip(spark, tmp_path):
    aligned = spark.createDataFrame(
        [
            ("S", "Uniq1", 10, "MSKTPAQTLV"),  # sub → null end fields
            ("S", "Uniq2", 5, "MS---AQTLV"),  # multi del → all fields set
        ],
        "protein string, cluster_id string, cluster_size long, aligned_seq string",
    )
    variants = call_variants(aligned, {"S": "MSKLPAQTLV"})

    out = str(tmp_path / "variants_raw")
    write_tsv_with_sentinel(variants, out)

    # on-disk format uses the reference's '-' sentinel for NULL fields
    raw = "".join(open(f).read() for f in glob.glob(f"{out}/part-*.csv"))
    sub_line = next(l for l in raw.splitlines() if "L4T" in l)
    fields = sub_line.split("\t")
    assert "-" in fields  # msa_end / ref_end sentinels present

    # reading back restores real NULLs
    back = read_tsv_all_string(spark, out)
    rows = {r["Code"]: r for r in back.collect()}
    assert rows["L4T"]["AA_End_MSA"] is None
    assert rows["K3_P5del"]["AA_End_MSA"] == "5"  # all-string read, value kept
