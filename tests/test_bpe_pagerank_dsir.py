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
    # merges is a chain of unioned 1-row frames: row ORDER is not
    # contractual, so sort by merge_rank before the positional compare
    # (ADVICE r7).
    sm = [
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["merged"], r["cnt"])
        for r in merges.orderBy("merge_rank").collect()
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


def test_link_prediction_degree_cap_invariant_below_cap(spark):
    """degree_cap >= max degree must be a no-op (the row_number filter
    keeps every neighbor), and an ACTIVE cap must still find pairs whose
    wedge centers survive truncation — on a graph whose hub exceeds the
    cap, the hub's wedge fan-out is bounded at cap^2."""
    from gisaid_pipeline_functions_spark.operators.graph import link_prediction

    # two 4-cliques sharing no edge, plus TWO hubs wired to everything
    # (two hubs -> cross-clique pairs get cn = 2 and pass min_cn)
    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    clique2 = [(i + 10, j + 10) for i, j in clique]
    hubs = [
        (i, h)
        for h in (98, 99)
        for i in list(range(4)) + list(range(10, 14))
    ]
    edges = spark.createDataFrame(clique + clique2 + hubs, "u long, v long")

    exact = link_prediction(edges, min_cn=2, k=100, degree_cap=None).collect()
    capped_noop = link_prediction(edges, min_cn=2, k=100, degree_cap=8).collect()
    # max degree is the hubs' 8 -> cap 8 keeps everything: identical
    assert sorted(map(tuple, exact)) == sorted(map(tuple, capped_noop))
    assert exact  # the two cliques' non-adjacent cross-hub pairs score

    active = link_prediction(edges, min_cn=2, k=100, degree_cap=3).collect()
    # with cap 3 the hub keeps neighbors {0,1,2}: pairs among them still
    # have cn >= 2 via clique wedges; every reported pair is a subset of
    # the exact candidate set with cn a lower bound of the exact cn
    exact_cn = {(r["u"], r["v"]): r["common_neighbors"] for r in exact}
    for r in active:
        key = (r["u"], r["v"])
        assert key in exact_cn
        assert r["common_neighbors"] <= exact_cn[key]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.text("ab c", min_size=0, max_size=20)),
        min_size=1,
        max_size=10,
    )
)
def test_perceptron_matches_python_reference(spark, rows):
    """The batch perceptron is integer-exact: replay the update rule in
    plain Python over the same features and demand identical weights and
    miss counts every round."""
    from gisaid_pipeline_functions_spark.operators.text import perceptron_train

    docs = spark.createDataFrame(
        [(i, t, lang) for i, (lang, t) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )
    feats = [
        (
            1 if lang == "en" else -1,
            1,
            len([w for w in t.split(" ") if w]),
            len(t),
        )
        for lang, t in rows
    ]
    w = [0, 0, 0]
    want = []
    for r in range(1, 4):
        d = [0, 0, 0]
        miss = 0
        for y, x0, x1, x2 in feats:
            if y * (w[0] * x0 + w[1] * x1 + w[2] * x2) <= 0:
                d = [d[0] + y * x0, d[1] + y * x1, d[2] + y * x2]
                miss += 1
        w = [w[i] + d[i] for i in range(3)]
        want.append((r, w[0], w[1], w[2], miss))
    got = [
        (r["round"], r["w_bias"], r["w_words"], r["w_chars"], r["n_miss"])
        for r in perceptron_train(docs, rounds=3).orderBy("round").collect()
    ]
    assert got == want
    spark.catalog.clearCache()


def test_kcenter_greedy_matches_bruteforce(spark, sf_dir):
    """The distributed greedy k-center selection equals the plain-Python
    greedy on the same 9dp-rounded distance lattice."""
    from gisaid_pipeline_functions_spark.operators.similarity import kcenter_greedy
    from gisaid_pipeline_functions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    seed = min(vecs)
    sel = [seed]
    md = {
        i: round(sum((a - b) * (a - b) for a, b in zip(v, vecs[seed])), 9)
        for i, v in vecs.items()
        if i != seed
    }
    want = [(1, seed, None)]
    for r in range(2, 7):
        far = max(md, key=lambda i: (md[i], -i))
        want.append((r, far, round(md[far], 6)))
        del md[far]
        for i in list(md):
            md[i] = min(
                md[i],
                round(
                    sum((a - b) * (a - b) for a, b in zip(vecs[i], vecs[far])),
                    9,
                ),
            )
    got = [
        (r["sel_rank"], r["vec_id"], r["dist_sq"])
        for r in kcenter_greedy(emb, k=6).orderBy("sel_rank").collect()
    ]
    assert got == want
    spark.catalog.clearCache()
