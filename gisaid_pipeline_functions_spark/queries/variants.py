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


def _derived_alignment(
    spark,
    sf_dir,
    gap_char: str | None = None,
    variants_only: bool = False,
    ref_only: bool = False,
):
    """(aligned_df_excluding_refs, {protein: ref_seq}) from documents.

    ``variants_only=True`` plants gaps only in the non-reference rows —
    the reference stays gap-free, so every gap region is a pure deletion
    (the SQL-expressible degenerate case ``variant_single_dels`` exploits).
    ``ref_only=True`` plants gaps only in the REFERENCE row — variants
    stay gap-free, so every gap region is a pure insertion/extension
    (``variant_single_ins``).
    """
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
    if gap_char is not None and not variants_only and not ref_only:
        seqs = seqs.withColumn(
            "seq", F.replace(F.col("seq"), F.lit(gap_char), F.lit("-"))
        )
    refs_rows = (
        seqs.groupBy("protein")
        .agg(F.min_by("seq", "doc_id").alias("ref_seq"), F.min("doc_id").alias("ref_id"))
        .collect()
    )
    refs = {r["protein"]: r["ref_seq"] for r in refs_rows}
    if gap_char is not None and ref_only:
        refs = {p: s.replace(gap_char, "-") for p, s in refs.items()}
    ref_ids = {r["protein"]: r["ref_id"] for r in refs_rows}
    ref_id_df = spark.createDataFrame(
        [(p, i) for p, i in ref_ids.items()], "protein string, ref_id long"
    )
    variant_seq = F.col("seq")
    if gap_char is not None and variants_only:
        variant_seq = F.replace(F.col("seq"), F.lit(gap_char), F.lit("-"))
    aligned = (
        seqs.join(F.broadcast(ref_id_df), "protein")
        .filter(F.col("doc_id") != F.col("ref_id"))
        .select(
            "protein",
            F.col("doc_id").cast("string").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            variant_seq.alias("aligned_seq"),
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


@register(
    "variant_single_dels",
    # Deletion-branch oracle (MSA_Reader.py:202–266 gap handling): gaps are
    # planted ONLY in the variant rows ('E' → '-'), so the reference stays
    # gap-free and every gap region degenerates to a pure deletion — which
    # IS SQL-expressible: maximal '-' runs via gaps-and-islands
    # (i - row_number), single-run → "{R}{pos}del", multi-run →
    # "{R}{a}_{R}{b}del". Substitutions come along for free. The Spark side
    # runs the REAL kernel; the oracle recomputes both event kinds
    # independently.
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
      SELECT s.source AS protein, s.doc_id, r.ref_seq,
             replace(s.seq, 'E', '-') AS var
      FROM seqs s JOIN refs r ON s.source = r.source AND s.doc_id <> r.ref_id
    ),
    pos AS (SELECT unnest(generate_series(1, {_SEQ_LEN})) AS i),
    subs AS (
      SELECT p.protein, p.doc_id,
             substr(p.ref_seq, CAST(i AS INT), 1) AS rc,
             substr(p.var, CAST(i AS INT), 1) AS vc, i
      FROM pairs p CROSS JOIN pos
      WHERE substr(p.ref_seq, CAST(i AS INT), 1) <> substr(p.var, CAST(i AS INT), 1)
        AND substr(p.var, CAST(i AS INT), 1) <> '-'
    ),
    gapspos AS (
      SELECT p.protein, p.doc_id, p.ref_seq, i,
             i - row_number() OVER (PARTITION BY p.doc_id ORDER BY i) AS grp
      FROM pairs p CROSS JOIN pos
      WHERE substr(p.var, CAST(i AS INT), 1) = '-'
    ),
    runs AS (
      SELECT protein, doc_id, any_value(ref_seq) AS ref_seq,
             min(i) AS a, max(i) AS b
      FROM gapspos GROUP BY protein, doc_id, grp
    )
    SELECT protein, CAST(doc_id AS VARCHAR) AS cluster_id, 'sub' AS type,
           rc || i || vc AS code, rc AS ref_aa, vc AS var_aa,
           CAST(i AS BIGINT) AS msa_start, CAST(NULL AS BIGINT) AS msa_end,
           CAST(i AS BIGINT) AS pos_start, CAST(NULL AS BIGINT) AS pos_end
    FROM subs
    UNION ALL
    SELECT protein, CAST(doc_id AS VARCHAR) AS cluster_id, 'del' AS type,
           CASE WHEN a = b THEN substr(ref_seq, CAST(a AS INT), 1) || a || 'del'
                ELSE substr(ref_seq, CAST(a AS INT), 1) || a || '_'
                     || substr(ref_seq, CAST(b AS INT), 1) || b || 'del' END AS code,
           substr(ref_seq, CAST(a AS INT), CAST(b - a + 1 AS INT)) AS ref_aa,
           CAST(NULL AS VARCHAR) AS var_aa,
           CAST(a AS BIGINT) AS msa_start,
           CASE WHEN a = b THEN CAST(NULL AS BIGINT) ELSE CAST(b AS BIGINT) END AS msa_end,
           CAST(a AS BIGINT) AS pos_start,
           CASE WHEN a = b THEN CAST(NULL AS BIGINT) ELSE CAST(b AS BIGINT) END AS pos_end
    FROM runs
    """,
)
def variant_single_dels(spark, sf_dir):
    aligned, refs = _derived_alignment(spark, sf_dir, gap_char="E", variants_only=True)
    out = call_variants(aligned, refs)
    return out.select(
        "protein",
        F.col("Cluster_ID").alias("cluster_id"),
        F.col("Type").alias("type"),
        F.col("Code").alias("code"),
        F.col("Ref_Residues").alias("ref_aa"),
        F.col("Var_Residues").alias("var_aa"),
        F.col("AA_Start_MSA").alias("msa_start"),
        F.col("AA_End_MSA").alias("msa_end"),
        F.col("AA_Start_Ref").alias("pos_start"),
        F.col("AA_End_Ref").alias("pos_end"),
    )


@register(
    "variant_single_ins",
    # Insertion/extension-branch oracle (MSA_Reader.py:340–420 flank logic,
    # incl. the index-0 N-flank truthiness quirk): gaps are planted ONLY in
    # the REFERENCE ('E' → '-'), variants stay gap-free, so every gap
    # region is a pure insertion — and since the gap runs live in the
    # per-protein reference, the regions are computed ONCE per protein and
    # cross-applied to every doc. Cases: both flanks → ins
    # "{N}{p}_{C}{q}ins{v}"; N-flank at MSA column 1 counts as NO flank
    # when a C-flank exists (quirk) → N-ext "{C}1ext{v}"; no C-flank →
    # C-ext "{N}{p}ext{v}". Substitutions at non-gap columns use the
    # gap-skipping reference numbering (running non-gap count).
    f"""
    WITH seqs AS (
      SELECT doc_id, source,
             upper(substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, {_SEQ_LEN})) AS seq
      FROM documents
      WHERE length(regexp_replace(text, '[^a-z]', '', 'g')) >= {_SEQ_LEN}
    ),
    refs AS (
      SELECT source, replace(arg_min(seq, doc_id), 'E', '-') AS ref,
             min(doc_id) AS ref_id
      FROM seqs GROUP BY source
    ),
    pairs AS (
      SELECT s.source AS protein, s.doc_id, s.seq
      FROM seqs s JOIN refs r ON s.source = r.source AND s.doc_id <> r.ref_id
    ),
    pos AS (SELECT unnest(generate_series(1, {_SEQ_LEN})) AS i),
    refchars AS (
      SELECT r.source, i, substr(r.ref, CAST(i AS INT), 1) AS rc,
             sum(CASE WHEN substr(r.ref, CAST(i AS INT), 1) <> '-' THEN 1 ELSE 0 END)
               OVER (PARTITION BY r.source ORDER BY i) AS refpos,
             max(CASE WHEN substr(r.ref, CAST(i AS INT), 1) <> '-' THEN i END)
               OVER (PARTITION BY r.source ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_i
      FROM refs r CROSS JOIN pos
    ),
    subs AS (
      SELECT p.protein, p.doc_id, rch.rc, substr(p.seq, CAST(rch.i AS INT), 1) AS vc,
             rch.i, rch.refpos
      FROM pairs p JOIN refchars rch ON rch.source = p.protein
      WHERE rch.rc <> '-' AND substr(p.seq, CAST(rch.i AS INT), 1) <> rch.rc
    ),
    runs AS (
      SELECT source, min(i) AS a, max(i) AS b
      FROM (SELECT source, i,
                   i - row_number() OVER (PARTITION BY source ORDER BY i) AS grp
            FROM refchars WHERE rc = '-')
      GROUP BY source, grp
    ),
    regions AS (
      SELECT r.source, r.a, r.b,
             ra.prev_i,
             nf.rc AS nf_c, nf.refpos AS nf_p,
             cf.rc AS cf_c, cf.refpos AS cf_p, cf.i AS cf_i
      FROM runs r
      JOIN refchars ra ON ra.source = r.source AND ra.i = r.a
      LEFT JOIN refchars nf ON nf.source = r.source AND nf.i = ra.prev_i
      LEFT JOIN refchars cf ON cf.source = r.source AND cf.i = r.b + 1
    ),
    ins AS (
      SELECT p.protein, p.doc_id, g.a, g.b,
             substr(p.seq, CAST(g.a AS INT), CAST(g.b - g.a + 1 AS INT)) AS var_aa,
             CASE WHEN g.prev_i IS NOT NULL
                   AND NOT (g.prev_i = 1 AND g.cf_i IS NOT NULL)
                  THEN 1 ELSE 0 END AS has_nf,
             g.nf_c, g.nf_p, g.cf_c, g.cf_p, g.cf_i
      FROM pairs p JOIN regions g ON g.source = p.protein
    )
    SELECT protein, CAST(doc_id AS VARCHAR) AS cluster_id, 'sub' AS type,
           rc || refpos || vc AS code, rc AS ref_aa, vc AS var_aa,
           CAST(i AS BIGINT) AS msa_start, CAST(NULL AS BIGINT) AS msa_end,
           CAST(refpos AS BIGINT) AS pos_start, CAST(NULL AS BIGINT) AS pos_end
    FROM subs
    UNION ALL
    SELECT protein, CAST(doc_id AS VARCHAR) AS cluster_id,
           CASE WHEN has_nf = 1 AND cf_i IS NOT NULL THEN 'ins' ELSE 'ext' END AS type,
           CASE WHEN has_nf = 1 AND cf_i IS NOT NULL
                  THEN nf_c || nf_p || '_' || cf_c || cf_p || 'ins' || var_aa
                WHEN cf_i IS NOT NULL
                  THEN cf_c || '1ext' || var_aa
                ELSE nf_c || nf_p || 'ext' || var_aa END AS code,
           CAST(NULL AS VARCHAR) AS ref_aa, var_aa,
           CAST(a AS BIGINT) AS msa_start,
           CASE WHEN a = b THEN CAST(NULL AS BIGINT) ELSE CAST(b AS BIGINT) END AS msa_end,
           CASE WHEN has_nf = 1 OR cf_i IS NULL
                THEN CAST(nf_p AS BIGINT) ELSE CAST(NULL AS BIGINT) END AS pos_start,
           CAST(cf_p AS BIGINT) AS pos_end
    FROM ins
    """,
)
def variant_single_ins(spark, sf_dir):
    aligned, refs = _derived_alignment(spark, sf_dir, gap_char="E", ref_only=True)
    out = call_variants(aligned, refs)
    return out.select(
        "protein",
        F.col("Cluster_ID").alias("cluster_id"),
        F.col("Type").alias("type"),
        F.col("Code").alias("code"),
        F.col("Ref_Residues").alias("ref_aa"),
        F.col("Var_Residues").alias("var_aa"),
        F.col("AA_Start_MSA").alias("msa_start"),
        F.col("AA_End_MSA").alias("msa_end"),
        F.col("AA_Start_Ref").alias("pos_start"),
        F.col("AA_End_Ref").alias("pos_end"),
    )


_KERNEL_ORACLE = f"""
    WITH seqs AS (
      SELECT doc_id, source,
             upper(substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, {_SEQ_LEN})) AS seq
      FROM documents
      WHERE length(regexp_replace(text, '[^a-z]', '', 'g')) >= {_SEQ_LEN}
    ),
    refs AS (
      SELECT source, replace(arg_min(seq, doc_id), 'U', '-') AS ref,
             min(doc_id) AS ref_id
      FROM seqs GROUP BY source
    ),
    pairs AS (
      SELECT s.source AS protein, s.doc_id, replace(s.seq, 'U', '-') AS var
      FROM seqs s JOIN refs r ON s.source = r.source AND s.doc_id <> r.ref_id
    ),
    pos AS (SELECT unnest(generate_series(1, {_SEQ_LEN})) AS i),
    refchars AS (
      SELECT r.source, i, substr(r.ref, CAST(i AS INT), 1) AS rc,
             sum(CASE WHEN substr(r.ref, CAST(i AS INT), 1) <> '-' THEN 1 ELSE 0 END)
               OVER (PARTITION BY r.source ORDER BY i) AS refpos,
             max(CASE WHEN substr(r.ref, CAST(i AS INT), 1) <> '-' THEN i END)
               OVER (PARTITION BY r.source ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_i
      FROM refs r CROSS JOIN pos
    ),
    varcols AS (
      SELECT p.protein, p.doc_id, rch.i, rch.rc, rch.refpos, rch.prev_i,
             substr(p.var, CAST(rch.i AS INT), 1) AS vc
      FROM pairs p JOIN refchars rch ON rch.source = p.protein
    ),
    gisl AS (
      SELECT *, i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM varcols WHERE rc = '-' OR vc = '-'
    ),
    runs AS (
      SELECT protein, doc_id, grp, max(i) AS g_b,
             min(i) FILTER (rc <> vc) AS a,
             max(i) FILTER (rc <> vc) AS e,
             bool_or(rc <> '-' AND vc = '-') AS has_del,
             bool_or(rc = '-' AND vc <> '-') AS has_ins,
             min(i) FILTER (rc <> '-') AS i_first,
             max(i) FILTER (rc <> '-') AS i_last
      FROM gisl GROUP BY protein, doc_id, grp
      HAVING min(i) FILTER (rc <> vc) IS NOT NULL
    ),
    ev AS (
      SELECT r2.protein, r2.doc_id, r2.a, r2.e, r2.has_del, r2.has_ins,
             ra.prev_i, nf.rc AS nf_c, nf.refpos AS nf_p,
             cf.rc AS cf_c, cf.refpos AS cf_p, cf.i AS cf_i,
             fi.rc AS fi_c, fi.refpos AS fi_p,
             la.rc AS la_c, la.refpos AS la_p, r2.i_first, r2.i_last,
             substr(rr.ref, CAST(r2.a AS INT), CAST(r2.e - r2.a + 1 AS INT)) AS ref_slice,
             substr(p.var, CAST(r2.a AS INT), CAST(r2.e - r2.a + 1 AS INT)) AS var_slice
      FROM runs r2
      JOIN refchars ra ON ra.source = r2.protein AND ra.i = r2.a
      LEFT JOIN refchars nf ON nf.source = r2.protein AND nf.i = ra.prev_i
      LEFT JOIN refchars cf ON cf.source = r2.protein AND cf.i = r2.g_b + 1
      LEFT JOIN refchars fi ON fi.source = r2.protein AND fi.i = r2.i_first
      LEFT JOIN refchars la ON la.source = r2.protein AND la.i = r2.i_last
      JOIN refs rr ON rr.source = r2.protein
      JOIN pairs p ON p.doc_id = r2.doc_id
    )
    SELECT protein, CAST(doc_id AS VARCHAR) AS cluster_id, 'sub' AS type,
           rc || refpos || vc AS code, rc AS ref_aa, vc AS var_aa,
           CAST(i AS BIGINT) AS msa_start, CAST(NULL AS BIGINT) AS msa_end,
           CAST(refpos AS BIGINT) AS pos_start, CAST(NULL AS BIGINT) AS pos_end
    FROM varcols WHERE rc <> '-' AND vc <> '-' AND rc <> vc
    UNION ALL
    SELECT protein, CAST(doc_id AS VARCHAR) AS cluster_id,
           CASE WHEN has_del AND has_ins THEN 'delins'
                WHEN has_del THEN 'del'
                WHEN prev_i IS NOT NULL
                     AND NOT (prev_i = 1 AND cf_i IS NOT NULL)
                     AND cf_i IS NOT NULL THEN 'ins'
                ELSE 'ext' END AS type,
           CASE WHEN has_del AND has_ins THEN
                  CASE WHEN i_first <> i_last
                       THEN fi_c || fi_p || '_' || la_c || la_p || 'delins'
                            || replace(var_slice, '-', '')
                       ELSE fi_c || fi_p || 'delins' || replace(var_slice, '-', '')
                  END
                WHEN has_del THEN
                  CASE WHEN a = e THEN fi_c || fi_p || 'del'
                       ELSE fi_c || fi_p || '_' || la_c || la_p || 'del' END
                WHEN prev_i IS NOT NULL
                     AND NOT (prev_i = 1 AND cf_i IS NOT NULL)
                     AND cf_i IS NOT NULL
                  THEN nf_c || nf_p || '_' || cf_c || cf_p || 'ins'
                       || replace(var_slice, '-', '')
                WHEN cf_i IS NOT NULL
                  THEN cf_c || '1ext' || replace(var_slice, '-', '')
                ELSE nf_c || nf_p || 'ext' || replace(var_slice, '-', '')
           END AS code,
           CASE WHEN has_del AND has_ins THEN ref_slice
                WHEN has_del THEN replace(ref_slice, '-', '')
                ELSE NULL END AS ref_aa,
           CASE WHEN has_del AND has_ins THEN var_slice
                WHEN has_del THEN NULL
                ELSE replace(var_slice, '-', '') END AS var_aa,
           CAST(a AS BIGINT) AS msa_start,
           CASE WHEN has_del AND has_ins THEN CAST(e AS BIGINT)
                WHEN a = e THEN CAST(NULL AS BIGINT)
                ELSE CAST(e AS BIGINT) END AS msa_end,
           CASE WHEN has_del AND has_ins THEN CAST(fi_p AS BIGINT)
                WHEN has_del THEN CAST(fi_p AS BIGINT)
                WHEN (prev_i IS NOT NULL
                      AND NOT (prev_i = 1 AND cf_i IS NOT NULL)
                      AND cf_i IS NOT NULL)
                     OR cf_i IS NULL
                  THEN CAST(nf_p AS BIGINT)
                ELSE CAST(NULL AS BIGINT) END AS pos_start,
           CASE WHEN has_del AND has_ins THEN
                  CASE WHEN i_first <> i_last THEN CAST(la_p AS BIGINT)
                       ELSE CAST(NULL AS BIGINT) END
                WHEN has_del THEN
                  CASE WHEN a = e THEN CAST(NULL AS BIGINT)
                       ELSE CAST(la_p AS BIGINT) END
                ELSE CAST(cf_p AS BIGINT) END AS pos_end
    FROM ev
    """


@register(
    "variant_call_kernel",
    # FULL-kernel oracle — every branch of the event classifier
    # (MSA_Reader.py:116–622: sub / del / ins / N-ext / C-ext / delins).
    # 'U' → '-' plants gaps in BOTH the reference and the variants, so gap
    # regions mix del and ins columns and exercise the delins machinery.
    # The oracle recomputes the classification independently: a region is
    # a maximal per-doc run of columns where either strand is gapped
    # (gaps-and-islands); its event columns (exactly one strand gapped)
    # decide del-only / ins-only / mixed→delins; leading/trailing
    # shared-gap columns are outside [a..e] exactly as the kernel skips
    # and trims them. delins keeps RAW gap-dash slices in ref_aa/var_aa
    # (the reference's parity quirk, MSA_Reader.py:614–616); insertion
    # flank logic incl. the MSA-column-1 truthiness quirk matches
    # variant_single_ins.
    _KERNEL_ORACLE,
)
def variant_call_kernel(spark, sf_dir):
    # mapping 'U' → '-' plants gaps in BOTH reference and variants, driving
    # the deletion / insertion / delins / extension branches at data scale
    aligned, refs = _derived_alignment(spark, sf_dir, gap_char="U")
    out = call_variants(aligned, refs)
    return out.select(
        "protein",
        F.col("Cluster_ID").alias("cluster_id"),
        F.col("Type").alias("type"),
        F.col("Code").alias("code"),
        F.col("Ref_Residues").alias("ref_aa"),
        F.col("Var_Residues").alias("var_aa"),
        F.col("AA_Start_MSA").alias("msa_start"),
        F.col("AA_End_MSA").alias("msa_end"),
        F.col("AA_Start_Ref").alias("pos_start"),
        F.col("AA_End_Ref").alias("pos_end"),
    )


@register(
    "variant_mutation_counts",
    # Part-4 count table oracle (MSA_Reader.py:1038–1162): reuse the full
    # kernel oracle for protein src0, replay break_up_deletions (multi-dels
    # explode to one row per deleted residue at positions start+1..end; the
    # original row keeps its start position), pivot type counts over the
    # full 1..ref_length spine (zero rows included; N-ext rows with NULL
    # start drop out, as in the reference's get_ref_start subsetting), and
    # format Percent_Variants as the reference's "x.xxxx%" string.
    f"""
    WITH kernel AS (
      SELECT * FROM ({_KERNEL_ORACLE}) WHERE protein = 'src0'
    ),
    seqs2 AS (
      SELECT doc_id, source,
             upper(substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, {_SEQ_LEN})) AS seq
      FROM documents
      WHERE length(regexp_replace(text, '[^a-z]', '', 'g')) >= {_SEQ_LEN}
        AND source = 'src0'
    ),
    scalars AS (
      SELECT length(replace(arg_min(seq, doc_id), 'U', '')) AS ref_length,
             count(*) - 1 AS total_seq
      FROM seqs2
    ),
    typed AS (
      SELECT pos_start AS pos, type FROM kernel WHERE pos_start IS NOT NULL
      UNION ALL
      SELECT unnest(generate_series(pos_start + 1, pos_end)) AS pos, 'del'
      FROM kernel WHERE type = 'del' AND pos_end IS NOT NULL
    ),
    counts AS (
      SELECT pos,
             count(*) FILTER (type = 'sub') AS subs,
             count(*) FILTER (type = 'ins') AS ins,
             count(*) FILTER (type = 'del') AS dels,
             count(*) FILTER (type = 'ext') AS exts,
             count(*) FILTER (type = 'delins') AS delins
      FROM typed GROUP BY pos
    ),
    spine AS (
      SELECT unnest(generate_series(1, (SELECT ref_length FROM scalars)))
        AS "Residue_Number"
    )
    SELECT CAST(s."Residue_Number" AS BIGINT) AS "Residue_Number",
           CAST(coalesce(subs,0) + coalesce(ins,0) + coalesce(dels,0)
                + coalesce(exts,0) + coalesce(delins,0) AS BIGINT)
             AS "Total_Variants",
           printf('%.4f%%',
                  (coalesce(subs,0) + coalesce(ins,0) + coalesce(dels,0)
                   + coalesce(exts,0) + coalesce(delins,0)) * 100.0
                  / (SELECT total_seq FROM scalars)) AS "Percent_Variants",
           CAST(coalesce(subs, 0) AS BIGINT) AS "Substitutions",
           CAST(coalesce(ins, 0) AS BIGINT) AS "Insertions",
           CAST(coalesce(dels, 0) AS BIGINT) AS "Deletions",
           CAST(coalesce(exts, 0) AS BIGINT) AS "Extensions",
           CAST(coalesce(delins, 0) AS BIGINT) AS "Indels"
    FROM spine s LEFT JOIN counts c ON c.pos = s."Residue_Number"
    """,
)
def variant_mutation_counts(spark, sf_dir):
    aligned, refs = _derived_alignment(spark, sf_dir, gap_char="U")
    one = aligned.filter(F.col("protein") == "src0")
    variants = call_variants(one, {"src0": refs["src0"]})
    ref_length = len(refs["src0"].replace("-", ""))
    total_seq = one.count()
    return mutation_count_table(variants, ref_length, total_seq)


@register(
    "aa_change_weights",
    # P4 (SURVEY §2 / reference Time_Series.py:393–467): the per-code
    # amino-acid-change weight mapping (plans/time_series.py
    # aa_change_weights), driven directly. The variants frame is derived
    # deterministically from documents — k = doc_id % 100 fans 100
    # distinct codes across all five Type branches (sub / del / ins /
    # delins / ext), null-vs-set AA_End_MSA, and gap-bearing residue
    # strings — and the oracle replays the string construction AND the
    # nongap (strip '-', count) rule, so the CASE logic itself is
    # value-hashed. Duplicate rows per code are bit-identical by
    # construction (attributes are functions of the code), matching the
    # real pipeline where a code's attributes repeat across clusters —
    # so the groupBy/first dedup is deterministic.
    """
    WITH v AS (SELECT DISTINCT doc_id % 100 AS k FROM documents),
    w AS (
      SELECT 'C' || CAST(k AS VARCHAR) AS Code,
             CASE k % 5 WHEN 0 THEN 'sub' WHEN 1 THEN 'del' WHEN 2 THEN 'ins'
                        WHEN 3 THEN 'delins' ELSE 'ext' END AS t,
             CASE WHEN k % 3 = 0 THEN NULL ELSE k END AS ae,
             repeat('R', CAST(1 + k % 4 AS INT)) || repeat('-', CAST(k % 2 AS INT)) AS rr,
             repeat('-', CAST(k % 3 AS INT)) || repeat('V', CAST(1 + k % 5 AS INT)) AS vr
      FROM v
    )
    SELECT Code,
           CAST(CASE t
                WHEN 'sub' THEN 1
                WHEN 'del' THEN CASE WHEN ae IS NULL THEN 1
                                ELSE length(replace(rr, '-', '')) END
                WHEN 'ins' THEN length(replace(vr, '-', ''))
                WHEN 'delins' THEN length(replace(vr, '-', ''))
                                   + length(replace(rr, '-', ''))
                ELSE CASE WHEN ae IS NULL THEN 1
                     ELSE length(replace(vr, '-', '')) END
                END AS BIGINT) AS aa_change_weight
    FROM w
    """,
)
def aa_change_weights_query(spark, sf_dir):
    from ..plans.time_series import aa_change_weights

    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id") % 100
    variants = docs.select(
        F.concat(F.lit("C"), k.cast("string")).alias("Code"),
        F.element_at(
            F.array(
                F.lit("sub"), F.lit("del"), F.lit("ins"),
                F.lit("delins"), F.lit("ext"),
            ),
            (k % 5 + 1).cast("int"),
        ).alias("Type"),
        F.when(k % 3 == 0, F.lit(None).cast("long")).otherwise(k).alias(
            "AA_End_MSA"
        ),
        F.concat(
            F.repeat(F.lit("R"), (1 + k % 4).cast("int")),
            F.repeat(F.lit("-"), (k % 2).cast("int")),
        ).alias("Ref_Residues"),
        F.concat(
            F.repeat(F.lit("-"), (k % 3).cast("int")),
            F.repeat(F.lit("V"), (1 + k % 5).cast("int")),
        ).alias("Var_Residues"),
    )
    return aa_change_weights(variants)
