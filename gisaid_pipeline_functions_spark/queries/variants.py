"""Variant-caller query registrations (SURVEY §2.11, §3.1).

The kernel itself is not SQL-expressible (driver gets a rows-only check),
but on a gap-free alignment it degenerates to pure substitution calling —
which IS SQL-expressible. ``variant_substitutions`` exploits that: the
Spark side runs the REAL mapInPandas kernel; the DuckDB oracle recomputes
the expected rows independently via positional string comparison. That
gives the kernel a genuine cross-engine correctness gate.

The alignments are derived deterministically from the ``documents`` table
(letters-only, fixed length 60, grouped by ``source`` as the "protein",
reference row = min doc_id per source).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.variant_caller import call_variants, mutation_count_table
from ..registry import register
from ..sources.tables import load_table

_SEQ_LEN = 60


def _derived_alignment(spark, sf_dir, gap_char: str | None = None):
    """(aligned_df_excluding_refs, {protein: ref_seq}) from documents."""
    docs = load_table(spark, sf_dir, "documents")
    letters = F.regexp_replace("text", "[^a-z]", "")
    seqs = (
        docs.filter(F.length(letters) >= _SEQ_LEN)
        .select(
            "doc_id",
            F.col("source").alias("protein"),
            F.upper(F.substring(letters, 1, _SEQ_LEN)).alias("seq"),
        )
    )
    if gap_char is not None:
        seqs = seqs.withColumn(
            "seq", F.replace(F.col("seq"), F.lit(gap_char), F.lit("-"))
        )
    refs_rows = (
        seqs.groupBy("protein")
        .agg(F.min_by("seq", "doc_id").alias("ref_seq"), F.min("doc_id").alias("ref_id"))
        .collect()
    )
    refs = {r["protein"]: r["ref_seq"] for r in refs_rows}
    ref_ids = {r["protein"]: r["ref_id"] for r in refs_rows}
    ref_id_df = spark.createDataFrame(
        [(p, i) for p, i in ref_ids.items()], "protein string, ref_id long"
    )
    aligned = (
        seqs.join(F.broadcast(ref_id_df), "protein")
        .filter(F.col("doc_id") != F.col("ref_id"))
        .select(
            "protein",
            F.col("doc_id").cast("string").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            F.col("seq").alias("aligned_seq"),
        )
    )
    return aligned, refs


@register(
    "variant_substitutions",
    # Oracle recomputes substitution calls independently: positional char
    # compare of each sequence against its group reference.
    f"""
    WITH seqs AS (
      SELECT doc_id, source,
             upper(substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, {_SEQ_LEN})) AS seq
      FROM documents
      WHERE length(regexp_replace(text, '[^a-z]', '', 'g')) >= {_SEQ_LEN}
    ),
    refs AS (
      SELECT source, arg_min(seq, doc_id) AS ref_seq, min(doc_id) AS ref_id
      FROM seqs GROUP BY source
    ),
    pairs AS (
      SELECT s.source AS protein, s.doc_id, s.seq, r.ref_seq
      FROM seqs s JOIN refs r ON s.source = r.source AND s.doc_id <> r.ref_id
    ),
    pos AS (SELECT unnest(generate_series(1, {_SEQ_LEN})) AS i)
    SELECT p.protein, CAST(p.doc_id AS VARCHAR) AS cluster_id,
           substr(p.ref_seq, CAST(i AS INT), 1) AS ref_aa,
           substr(p.seq, CAST(i AS INT), 1) AS var_aa,
           CAST(i AS BIGINT) AS pos,
           substr(p.ref_seq, CAST(i AS INT), 1) || i
             || substr(p.seq, CAST(i AS INT), 1) AS code
    FROM pairs p CROSS JOIN pos
    WHERE substr(p.ref_seq, CAST(i AS INT), 1) <> substr(p.seq, CAST(i AS INT), 1)
    """,
)
def variant_substitutions(spark, sf_dir):
    aligned, refs = _derived_alignment(spark, sf_dir)
    out = call_variants(aligned, refs)
    return out.select(
        "protein",
        F.col("Cluster_ID").alias("cluster_id"),
        F.col("Ref_Residues").alias("ref_aa"),
        F.col("Var_Residues").alias("var_aa"),
        F.col("AA_Start_Ref").alias("pos"),
        F.col("Code").alias("code"),
    )


@register("variant_call_kernel")  # rows-only: full del/ins/delins machinery
def variant_call_kernel(spark, sf_dir):
    # mapping 'U' → '-' plants gaps in BOTH reference and variants, driving
    # the deletion / insertion / delins / extension branches at data scale
    aligned, refs = _derived_alignment(spark, sf_dir, gap_char="U")
    return call_variants(aligned, refs)


@register("variant_mutation_counts")  # rows-only: kernel → break_up → pivot
def variant_mutation_counts(spark, sf_dir):
    aligned, refs = _derived_alignment(spark, sf_dir, gap_char="U")
    one = aligned.filter(F.col("protein") == "src0")
    variants = call_variants(one, {"src0": refs["src0"]})
    ref_length = len(refs["src0"].replace("-", ""))
    total_seq = one.count()
    return mutation_count_table(variants, ref_length, total_seq)
