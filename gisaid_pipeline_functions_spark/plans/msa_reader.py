"""The MSA_Reader `main` pipeline (SURVEY §3.1) — one call runs what the
reference does in four disk-materialized parts (MSA_Reader.py:1164–1247):

  Part 1  variant calling          → `call_variants` kernel (cached once)
  Part 2  cluster + code reports   → plans.reports (grouped aggregations)
  Part 3  mutation CSV             → plans.reports.mutation_csv
  Part 4  per-position count table → operators.variant_caller.mutation_count_table

The reference writes `_variants_raw.tsv` then re-reads it into objects
between Parts 1→2; here the event table is a cached DataFrame feeding all
downstream reports in one DAG. `read_msa_all`'s sequential per-protein
loop (MSA_Reader.py:1292–1329) is the `protein` column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.variant_caller import call_variants, mutation_count_table
from .reports import (
    cluster_report_text,
    code_report_text,
    mutation_csv,
    variants_by_cluster,
)


@dataclass
class MsaReaderOutputs:
    variants_raw: DataFrame          # the 10-column event table (Part 1)
    by_cluster: DataFrame            # Part 2a grouped lists
    cluster_report: DataFrame        # Part 2a text blocks
    sub_report: DataFrame            # Part 2b per type
    ins_report: DataFrame
    del_report: DataFrame
    indel_report: DataFrame
    all_by_code: DataFrame           # Part 3 mutation CSV
    variant_counts: DataFrame        # Part 4 position × type table


def reports_from_variants(
    variants: DataFrame, total_seq: int, ref_length: int
) -> MsaReaderOutputs:
    """Build the full report suite from an already-computed event table —
    lets multi-protein callers (``api.read_msa_all``) run the kernel ONCE
    and slice the cached events per protein instead of re-running the
    kernel per protein."""
    return MsaReaderOutputs(
        variants_raw=variants,
        by_cluster=variants_by_cluster(variants),
        cluster_report=cluster_report_text(variants),
        sub_report=code_report_text(variants, "sub"),
        ins_report=code_report_text(variants, "ins"),
        del_report=code_report_text(variants, "del"),
        indel_report=code_report_text(variants, "indel"),
        all_by_code=mutation_csv(variants, total_seq),
        variant_counts=mutation_count_table(variants, ref_length, total_seq),
    )


def run_msa_reader(
    aligned: DataFrame,
    references: dict[str, str],
    total_seq: int,
    ref_length: int,
) -> MsaReaderOutputs:
    """Run the full report suite over one protein's alignment (pass a
    pre-filtered ``aligned`` and that protein's reference; multi-protein
    callers keep `protein` as a column and group the reports by it)."""
    variants = call_variants(aligned, references).cache()
    return reports_from_variants(variants, total_seq, ref_length)
