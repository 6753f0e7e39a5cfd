"""Hypothesis properties for the incremental LSH dedup (streaming/lsh.py):
the map-side per-row signature path must be BIT-IDENTICAL to the batch
explode+groupBy pipeline on ARBITRARY texts (not just the documents
testdata) — including the tokenization edges the corpus never hits
(double spaces, trailing separators, sub-k docs, all-duplicate words) —
and the greedy bucket-min drop rule must never drop a doc the batch
transitive dedup would keep."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from gisaid_pipeline_functions_spark.streaming.lsh import band_signatures

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# tiny alphabet → heavy shingle collisions; '' interleaved via the
# separator join below produces double/trailing spaces, the empty-token
# edge the length>0 filters on both paths must agree on
_WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e", ""])
_TEXT = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)


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


@given(texts=st.lists(_TEXT, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_mapside_bands_bitwise_match_batch(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    batch = {
        (r["doc_id"], r["band"], r["sig"])
        for r in _batch_bands(docs).collect()
    }
    mapside = {
        (r["doc_id"], r["band"], r["sig"])
        for r in band_signatures(docs).collect()
    }
    assert batch == mapside


@given(texts=st.lists(_TEXT, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_greedy_drops_subset_of_transitive(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
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
    sig = minhash_signatures(
        word_shingles(docs, "doc_id", "text", k=3, distinct=False), n_hashes=8
    )
    pairs = lsh_candidate_pairs(sig, n_bands=2, rows_per_band=4).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs)
    transitive_drops = {
        r["id"]
        for r in comp.filter(F.col("id") != F.col("component")).collect()
    }
    # greedy keeps ⊇ transitive keeps, i.e. greedy never drops a doc the
    # batch transitive rule keeps — on ANY corpus
    assert greedy_drops <= transitive_drops
