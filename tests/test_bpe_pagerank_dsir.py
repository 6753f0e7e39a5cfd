"""Property tests for the round-7 iterative/training operators: the BPE
merge fold vs a canonical Python reference on adversarial random inputs
(the variant-kernel hypothesis precedent), PageRank invariants, and DSIR
determinism."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _ref_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Canonical greedy BPE merge application: leftmost occurrence first,
    non-overlapping — the textbook semantics both engines must agree on."""
    out: list[str] = []
    prev: str | None = None
    for x in syms:
        if prev == a and x == b:
            out.append(a + b)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = x
    if prev is not None:
        out.append(prev)
    return out


def _ref_bpe(words_freq: dict[str, int], n: int):
    vocab = {w: [*w, "</w>"] for w in words_freq}
    merges = []
    for r in range(n):
        c: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += words_freq[w]
        if not c:
            break
        (a, b), cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r + 1, a, b, a + b, cnt))
        vocab = {w: _ref_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


# Tiny alphabet maximizes repeated/overlapping pairs — the adversarial
# regime for the non-overlap parity rule ("aaaa" chains etc.).
_WORD = st.text(alphabet="ab", min_size=1, max_size=6)


@settings(max_examples=12, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=12), st.integers(0, 3))
def test_bpe_learn_matches_python_reference(spark, ws, seed):
    docs = spark.createDataFrame(
        [(i, " ".join(ws[i::2]) if ws[i::2] else ws[0]) for i in range(2)],
        "doc_id long, text string",
    )
    from gisaid_pipeline_functions_spark.operators.text import bpe_learn

    wf: Counter = Counter()
    for r in docs.collect():
        wf.update(w for w in r["text"].split(" ") if w)
    rm, rv = _ref_bpe(dict(wf), 3)
    merges, vocab = bpe_learn(docs, n_merges=3)
    sm = [
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["merged"], r["cnt"])
        for r in merges.collect()
    ]
    sv = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert sm == rm
    assert sv == rv
    spark.catalog.clearCache()


def test_pagerank_invariants(spark):
    """Rank mass ≈ 1 (6dp rounding drift aside), symmetric graphs give
    symmetric ranks, higher-degree vertices outrank pendants."""
    from gisaid_pipeline_functions_spark.operators.graph import pagerank

    # star: center 0 with leaves 1..4, plus pendant pair 5-6
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)], "u long, v long"
    )
    ranks = {r["vertex"]: r["pagerank"] for r in pagerank(edges, 5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-3
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4]
    assert ranks[5] == ranks[6]
    assert ranks[0] > ranks[1] > 0
    spark.catalog.clearCache()


def test_dsir_is_deterministic_and_prefers_target_like_docs(spark, sf_dir):
    from gisaid_pipeline_functions_spark.operators.text import dsir_resample
    from gisaid_pipeline_functions_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = dsir_resample(docs, k=20).collect()
    b = dsir_resample(docs, k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # no RNG state
    assert len(a) == 20
    # keys are sorted descending with doc_id tie-break
    keys = [(r["gumbel_key"], -r["doc_id"]) for r in a]
    assert keys == sorted(keys, reverse=True)
    spark.catalog.clearCache()


def test_bpe_token_counts_consistent_with_vocab(spark):
    from gisaid_pipeline_functions_spark.operators.text import (
        bpe_learn,
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(0, "aa ab aa"), (1, "b aa")], "doc_id long, text string"
    )
    merges, vocab = bpe_learn(docs, n_merges=2)
    tok = {r["word"]: r["n_tokens"] for r in vocab.collect()}
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, vocab).collect()}
    assert out[0]["n_words"] == 3
    assert out[0]["n_bpe_tokens"] == 2 * tok["aa"] + tok["ab"]
    assert out[1]["n_bpe_tokens"] == tok["b"] + tok["aa"]
    spark.catalog.clearCache()
