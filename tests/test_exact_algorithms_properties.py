"""Randomized losslessness checks for the exact-by-construction operators
(prefix-filter similarity join, deletion-neighborhood fuzzy join,
degree-ordered triangle counting).

Each operator's driver oracle proves equality with a brute-force
computation on ONE dataset; these tests re-prove it on seeded random
inputs engineered to stress the pruning logic (dense token collisions,
clustered near-duplicates, shift-heavy strings, hub-skewed graphs) —
the configurations where a wrong prefix bound, positional filter, or
orientation rule would actually lose or duplicate results.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F


def _python_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed,tau", [(1, 0.5), (2, 0.8), (3, 0.6)])
def test_prefix_filter_matches_bruteforce(spark, seed, tau):
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(40)]  # small vocab → heavy collisions
    docs = []
    for d in range(30):
        base = rng.sample(vocab, rng.randint(5, 20))
        docs.append((d, base))
        if rng.random() < 0.5:  # planted near-duplicate
            mutated = list(base)
            if len(mutated) > 6:
                mutated.pop(rng.randrange(len(mutated)))
            docs.append((1000 + d, mutated))
    rows = [(i, t) for i, toks in docs for t in set(toks)]
    from gisaid_pipeline_functions_spark.operators.dedup import prefix_filter_pairs

    tokens = spark.createDataFrame(rows, ["id", "token"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_pairs(tokens, tau).collect()
    }
    sets = {i: set(toks) for i, toks in docs}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if round(j, 6) >= tau:
            want[(a, b)] = round(j, 6)
    assert got == want  # lossless: exact same pairs AND exact same jaccards


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_edit_distance_join_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    alphabet = "ab0"  # tiny alphabet → dense deletion-variant collisions
    base = {"".join(rng.choices(alphabet, k=rng.randint(3, 7))) for _ in range(40)}
    mutated = set()
    for s in list(base)[:20]:  # planted ed-1 neighbors of every kind
        i = rng.randrange(len(s))
        mutated.add(s[:i] + s[i + 1:])                      # deletion
        mutated.add(s[:i] + rng.choice(alphabet) + s[i:])   # insertion
        mutated.add(s[:i] + rng.choice(alphabet) + s[i + 1:])  # substitution
    names = sorted(x for x in (base | mutated) if x)
    from gisaid_pipeline_functions_spark.operators.joins import (
        edit_distance_one_pairs,
    )

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.name_a, r.name_b): r.edit_distance
        for r in edit_distance_one_pairs(df, "name").collect()
    }
    want = {}
    for a, b in itertools.combinations(names, 2):
        d = _python_levenshtein(a, b)
        if d <= 1:
            want[(a, b)] = d
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_triangle_counts_match_bruteforce(spark, seed):
    rng = random.Random(seed)
    n = 25
    edges = set()
    hub = 0  # force skew: the hub connects to almost everything
    for v in range(1, n):
        if rng.random() < 0.8:
            edges.add((hub, v))
    for _ in range(120):
        a, b = rng.sample(range(n), 2)
        edges.add((min(a, b), max(a, b)))
    from gisaid_pipeline_functions_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(sorted(edges), ["u", "v"])
    got = {r.vertex: r.n_triangles for r in triangle_counts(df).collect()}
    adj = {v: set() for v in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    assert got == want


def test_prefix_filter_exact_threshold_under_ieee_overceiling(spark):
    """ADVICE-r6 regression, constructed to make the naive float bounds
    actually LOSE a pair: at tau=0.28 the product tau*25 evaluates to
    7.000000000000001, so (a) a naive ceil shortens A's prefix from 19
    to 18 — and A's one shared-prefix token sits exactly at position 19
    (its 18 unique df=1 tokens sort before the shared df=2 tokens) —
    and (b) the naive length filter rejects |B| = 7 >= tau*|A|. The
    pair (A, B) has jaccard exactly 7/25 = 0.28 and must be found; the
    9dp-rounded bounds recover it, verified against brute force over
    the whole corpus."""
    from gisaid_pipeline_functions_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    tau = 0.28
    shared = [f"s{i}" for i in range(7)]
    docs = {
        0: shared + [f"a{i}" for i in range(18)],  # |A| = 25
        1: list(shared),  # |B| = 7; jaccard(A,B) = 7/25 = 0.28 exactly
        # noise docs so df ranking and the self-join are non-trivial
        2: [f"n{i}" for i in range(12)],
        3: [f"n{i}" for i in range(6)] + [f"m{i}" for i in range(6)],
    }
    rows = [(i, t) for i, toks in docs.items() for t in toks]
    tokens = spark.createDataFrame(rows, ["id", "token"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_pairs(tokens, tau).collect()
    }
    import itertools

    sets = {i: set(t) for i, t in docs.items()}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if round(j, 6) >= tau:
            want[(a, b)] = round(j, 6)
    assert (0, 1) in want  # the construction is on-threshold by design
    assert got == want
    spark.catalog.clearCache()


def _rand_graph(rng, n_min=12, n_max=25, p=0.25, hub=True):
    """Seeded random simple graph (u < v), optionally with a hub vertex."""
    n = rng.randint(n_min, n_max)
    edges = set()
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < p:
                edges.add((a, b))
    if hub:  # skew: one vertex connected to most others
        for b in range(1, n):
            if rng.random() < 0.8:
                edges.add((0, b))
    return sorted(edges)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_label_propagation_matches_python(spark, seed):
    rng = random.Random(seed)
    edges = _rand_graph(rng)
    from gisaid_pipeline_functions_spark.operators.graph import label_propagation

    got = {
        r.vertex: r.label
        for r in label_propagation(
            spark.createDataFrame(edges, "u long, v long"), iterations=4
        ).collect()
    }
    # pure-Python synchronous LPA: most-frequent neighbor label, ties →
    # smallest label
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {x: x for x in adj}
    for _ in range(4):
        nxt = {}
        for x, nbrs in adj.items():
            votes = {}
            for nb in nbrs:
                votes[labels[nb]] = votes.get(labels[nb], 0) + 1
            nxt[x] = min(
                votes, key=lambda lab: (-votes[lab], lab)
            )
        labels = nxt
    assert got == labels


@pytest.mark.parametrize("seed,k", [(21, 3), (22, 4), (23, 2)])
def test_kcore_matches_python(spark, seed, k):
    rng = random.Random(seed)
    edges = _rand_graph(rng)
    from gisaid_pipeline_functions_spark.operators.graph import kcore_peel

    got = {
        r.vertex: r.degree
        for r in kcore_peel(
            spark.createDataFrame(edges, "u long, v long"), k=k, rounds=4
        ).collect()
    }
    e = list(edges)
    for _ in range(4):
        deg = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {x for x, d in deg.items() if d >= k}
        e = [(u, v) for u, v in e if u in keep and v in keep]
    deg = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert got == deg


@pytest.mark.parametrize("seed,k", [(31, 16), (32, 8)])
def test_kmv_matches_python(spark, seed, k):
    import hashlib

    rng = random.Random(seed)
    a_keys = {rng.randint(0, 10_000) for _ in range(300)}
    b_keys = {rng.randint(0, 10_000) for _ in range(300)} | set(
        list(a_keys)[:100]
    )
    from gisaid_pipeline_functions_spark.operators.sketches import (
        kmv_set_estimates,
    )

    row = kmv_set_estimates(
        spark.createDataFrame([(x,) for x in a_keys], "k long"),
        spark.createDataFrame([(x,) for x in b_keys], "k long"),
        "k",
        k=k,
    ).collect()[0]

    def u32(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)

    sa = sorted({u32(x) for x in a_keys})[:k]
    sb = sorted({u32(x) for x in b_keys})[:k]
    m = sorted(set(sa) | set(sb))[:k]

    def est(s):
        return float(len(s)) if len(s) < k else (k - 1) * 2**32 / (s[-1] + 1.0)

    n_both = len([v for v in m if v in set(sa) and v in set(sb)])
    assert row.n_a == len(sa) and row.n_b == len(sb)
    assert row.n_union == len(m) and row.n_both == n_both
    assert row.est_a == round(est(sa), 6)
    assert row.est_union == round(est(m), 6)
    assert row.jaccard == round(n_both / len(m), 6)
