"""Resumable batch LSH dedup (VERDICT r10 #5 / r11 #3):
``operators.dedup.build_lsh_band_index`` / ``apply_lsh_band_index``.

The driver query (``dedup_incremental_index``) proves ONE base+delta
resume against the from-scratch oracle; these tests prove the stronger
contract the capability actually claims: a TWO-delta replay — each
batch resumed from the previous batch's parquet-persisted index —
reproduces both the from-scratch drop set AND the from-scratch
compacted index, and the index round-trips through disk losslessly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.dedup import (
    apply_lsh_band_index,
    build_lsh_band_index,
)
from gisaid_pipeline_functions_spark.streaming.lsh import band_signatures

INDEX_SCHEMA = "band int, sig string, keeper long"


def _from_scratch(docs):
    """The greedy bucket-min rule over the full corpus in one pass —
    the same semantics the streaming twin and the driver oracle use."""
    bands = band_signatures(docs)
    mins = bands.groupBy("band", "sig").agg(F.min("doc_id").alias("keeper"))
    drops = {
        r["doc_id"]
        for r in bands.join(mins, ["band", "sig"])
        .filter(F.col("doc_id") > F.col("keeper"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    index = {(r["band"], r["sig"], r["keeper"]) for r in mins.collect()}
    return drops, index


def test_two_delta_resume_equals_from_scratch(spark, sf_dir, tmp_path):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK index, must reproduce the from-scratch drop set and the
    from-scratch compacted index exactly (append-only id contract:
    batches split at ascending id cutoffs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    batches = [
        docs.filter(F.col("doc_id") <= c1),
        docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        docs.filter(F.col("doc_id") > c2),
    ]

    cur_path = None
    replay_drops: set[int] = set()
    for i, batch in enumerate(batches):
        saved = (
            spark.read.parquet(cur_path)
            if cur_path
            else spark.createDataFrame([], INDEX_SCHEMA)
        )
        drops, updated = apply_lsh_band_index(saved, batch)
        replay_drops |= {r["doc_id"] for r in drops.collect()}
        cur_path = str(tmp_path / f"idx{i}")
        updated.write.parquet(cur_path)

    scratch_drops, scratch_index = _from_scratch(docs)
    assert replay_drops == scratch_drops
    final_index = {
        (r["band"], r["sig"], r["keeper"])
        for r in spark.read.parquet(cur_path).collect()
    }
    assert final_index == scratch_index


def test_build_index_roundtrips_and_matches_bands(spark, sf_dir, tmp_path):
    """build_lsh_band_index is exactly the per-bucket min of the map-side
    band signatures, and survives a parquet write→read bit-identically
    (the artifact the resume path consumes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_lsh_band_index(docs)
    expected = {
        (r["band"], r["sig"], r["keeper"])
        for r in band_signatures(docs)
        .groupBy("band", "sig")
        .agg(F.min("doc_id").alias("keeper"))
        .collect()
    }
    assert {
        (r["band"], r["sig"], r["keeper"]) for r in idx.collect()
    } == expected
    p = str(tmp_path / "idx")
    idx.write.parquet(p)
    back = spark.read.parquet(p)
    assert {
        (r["band"], r["sig"], r["keeper"]) for r in back.collect()
    } == expected


def test_empty_delta_is_identity(spark, sf_dir):
    """A delta with no rows (or no shingle-bearing docs) drops nothing
    and leaves the index unchanged — the no-new-data resume."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_lsh_band_index(docs)
    empty = docs.filter(F.lit(False))
    drops, updated = apply_lsh_band_index(idx, empty)
    assert drops.count() == 0
    assert updated.exceptAll(idx).count() == 0
    assert idx.exceptAll(updated).count() == 0
