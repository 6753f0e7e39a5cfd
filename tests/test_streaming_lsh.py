"""Incremental MinHash-LSH dedup (streaming/lsh.py): map-side signature
parity with the batch operators, cross-micro-batch state, and the
greedy-superset relationship to the batch transitive dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from gisaid_pipeline_functions_spark.streaming.lsh import (
    band_signatures,
    streaming_lsh_drops,
)


def _batch_bands(docs):
    sh = word_shingles(docs, "doc_id", "text", k=3, distinct=False)
    sig = minhash_signatures(sh, n_hashes=8)
    parts = []
    for b in range(2):
        cols = [f"mh{b * 4 + r}" for r in range(4)]
        parts.append(
            sig.select(
                F.col("id").alias("doc_id"),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("sig"),
            )
        )
    return parts[0].unionByName(parts[1])


def test_mapside_bands_match_batch(spark, sf_dir):
    """The stream-safe per-row signature must be bit-identical to the
    explode+groupBy batch pipeline (this is the gate the F.transform
    index-argument arity bug failed: a 2-param lambda receives the
    element INDEX, not the captured loop variable)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = ["doc_id", "band", "sig"]
    batch = _batch_bands(docs).select(*cols)
    mapside = band_signatures(docs).select(*cols)
    assert batch.exceptAll(mapside).count() == 0
    assert mapside.exceptAll(batch).count() == 0


def test_band_signatures_plan_is_shuffle_free(spark, sf_dir):
    """The streaming-safety claim is structural: the whole doc → bands
    path must be map-side (no Exchange before the stateful operator's
    own groupBy) — a shuffle here would both break the stream plan and
    re-introduce the batch pipeline's explode+groupBy cost."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        band_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_state_survives_micro_batches(spark, sf_dir, tmp_path):
    """A later micro-batch's doc colliding with an earlier batch's
    keeper must be dropped — the band index is cross-batch state, which
    the single-file driver query cannot exercise."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    backlog = str(tmp_path / "backlog")
    # batch 1: originals; batch 2: exact near-dups under shifted ids
    docs.coalesce(1).write.parquet(f"{backlog}/b=1")
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).coalesce(
        1
    ).write.parquet(f"{backlog}/b=2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{backlog}/*")
    )
    q = (
        streaming_lsh_drops(stream)
        .writeStream.format("memory")
        .queryName("lsh_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drops = {
        r["doc_id"]
        for r in spark.sql(
            "SELECT DISTINCT doc_id FROM lsh_state_test"
        ).collect()
    }
    with_bands = {
        r["doc_id"] for r in band_signatures(docs).select("doc_id").collect()
    }
    # every shifted copy of a doc that has band signatures collides with
    # its original (identical text → identical bands)
    assert {d + 1_000_000 for d in with_bands} <= drops
    # no original is dropped by its own copy (copies have larger ids and
    # arrive in the later batch)
    assert all(d >= 1_000_000 for d in drops if d not in with_bands)


def test_greedy_keeps_superset_of_transitive(spark, sf_dir):
    """Greedy bucket-min keeps ⊇ transitive component-min keeps: every
    component min is first in all its buckets, so the stream never drops
    a doc the batch dedup_near_keep_first would keep."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bands = band_signatures(docs)
    mins = bands.groupBy("band", "sig").agg(F.min("doc_id").alias("keeper"))
    greedy_drops = {
        r["doc_id"]
        for r in bands.join(mins, ["band", "sig"])
        .filter(F.col("doc_id") > F.col("keeper"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    sh = word_shingles(docs, "doc_id", "text", k=3, distinct=False)
    sig = minhash_signatures(sh, n_hashes=8)
    pairs = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs)
    transitive_drops = {
        r["id"]
        for r in comp.filter(F.col("id") != F.col("component")).collect()
    }
    assert greedy_drops <= transitive_drops
