"""Streaming first-seen dedup: duplicated backlog must resolve to the
batch exact-dedup result."""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.streaming.dedup import streaming_first_seen


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # build a backlog WITH duplicates: every doc twice under different ids
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    backlog_dir = str(tmp_path / "backlog")
    docs.unionByName(dup).write.parquet(backlog_dir)

    expected = {
        r["fingerprint"]: (r["keeper_id"], r["n"])
        for r in docs.unionByName(dup)
        .groupBy(F.md5("text").alias("fingerprint"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n"))
        .collect()
    }

    stream = spark.readStream.schema("doc_id long, text string").parquet(backlog_dir)
    q = (
        streaming_first_seen(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM stream_dedup_test").collect()
    final: dict[str, tuple] = {}
    for r in rows:  # last update per fingerprint wins
        final[r["fingerprint"]] = (r["keeper_id"], r["n_dupes_dropped"])

    assert set(final) == set(expected)
    for fp, (keeper, n) in expected.items():
        assert final[fp][0] == keeper  # min id kept
        assert final[fp][1] == n - 1  # all but the keeper dropped
