"""r18 staging: OPQ-style variance-balancing dimension allocation for PQ.

Design prototype (NO package code, NO registrations — the r16 m=4 ADC
pin pattern: pin the semantics value-level one round before the
operator lands, so the r18 implementation has a regression gate on day
one). The target operator is the permutation member of the OPQ family
(Ge et al., "Optimized Product Quantization", CVPR 2013 §4.2
"eigenvalue allocation"; FAISS `OPQMatrix` is the public
implementation model): instead of learning a dense rotation — whose
SVD/Procrustes training is not SQL-expressible, so it could never be
oracle-gated — allocate the RAW dimensions to PQ subspaces so each
subspace carries a balanced share of the corpus variance. That is the
diagonal/permutation specialization of eigenvalue allocation, it
composes with the existing `pq_codebooks`/`pq_codes`/ADC pipeline as a
pure map-side array reorder, and it is exactly SQL-expressible.

Cross-engine determinism design (the part this module pins):

* Per-dim variance is compared via the EXACT integer score
  ``n*sum(q_j^2) - (sum(q_j))^2`` over micro-unit quantized values
  ``q = round(x * 10_000)`` — all-BIGINT, order-free, so Spark and
  DuckDB rank dimensions identically with no float hazard. Raw
  float32 embedding variances have adjacent gaps down to ~1.1e-6
  (measured at sf0.001), so ranking on `round(var_pop(x), 6)` WOULD
  collide across engines; ranking on exact integers cannot. (The
  integer-micro-unit pattern is `ivf_assignment_drift`'s, the exact
  big-int moment lesson is r10's squared-cents trap — CLAUDE.md.)
* Allocation is SNAKE (boustrophedon) over the variance ranking:
  rank i goes to subspace ``i % m`` on even passes and
  ``m-1 - (i % m)`` on odd passes, capacity d/m each — pure integer
  arithmetic on ranks, replayable in SQL with one window function,
  no greedy float accumulator to drift (the greedy min-log-product
  variant of eigenvalue allocation needs cross-engine float sum
  comparisons; snake does not, and gets within a few percent of it).
* Within a subspace, dims are laid out ascending — a canonical layout
  so the permutation is unique given the ranking.

Scale safety (asserted below): with |x| <= ~3.3 (unit-ish float32
embeddings), |q| <= 33_000, so q^2 <= 1.1e9 and the BIGINT score
stays under 2^63 up to n ~ 8.4e9 rows PER DIMENSION — comfortably
past the 100 TB corpus row counts a single frozen quantizer would
ever be trained on (and the moments can shard by dim-range if not).

Properties pinned (all on real testdata, sf0.001 by default,
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the big run):

1. the allocation is a valid permutation in d/m-sized groups;
2. it follows the snake of the exact-integer ranking (independent
   recomputation);
3. log-variance balance: the max-min spread of per-subspace
   sum(log var) improves vs the identity layout on raw AND on
   deterministically skew-scaled data;
4. PQ distortion: total Lloyd SSE under the snake layout beats the
   identity layout on skew-scaled data by a real margin (~8.6%
   measured; gated at >2%), and does not regress on raw data beyond
   float noise;
5. the BIGINT score bound arithmetic above.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
M, D = 4, 64
SUB = D // M
MICRO = 10_000


def _embeddings() -> np.ndarray:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    return np.array(t.column("embedding").to_pylist(), dtype=np.float64)


def _skewed(x: np.ndarray) -> np.ndarray:
    # deterministic per-dim scaling so variance balancing has real work
    # to do regardless of how uniform the raw testdata variances are
    return x * np.array([1.0 + j / 8.0 for j in range(x.shape[1])])


def _int_scores(x: np.ndarray) -> list[int]:
    """Exact per-dim variance scores: n*sum(q^2) - (sum(q))^2 over
    micro-unit lattice codes, in arbitrary-precision Python ints (the
    r10 lesson: numpy int64 reductions silently wrap big moments)."""
    n = x.shape[0]
    q = np.round(x * MICRO).astype(np.int64)
    scores = []
    for j in range(x.shape[1]):
        col = [int(v) for v in q[:, j]]
        s1 = sum(col)
        s2 = sum(v * v for v in col)
        scores.append(n * s2 - s1 * s1)
    return scores


def _snake_allocation(x: np.ndarray) -> list[list[int]]:
    scores = _int_scores(x)
    order = sorted(range(x.shape[1]), key=lambda j: (-scores[j], j))
    groups: list[list[int]] = [[] for _ in range(M)]
    for i, j in enumerate(order):
        p, r = divmod(i, M)
        s = r if p % 2 == 0 else M - 1 - r
        groups[s].append(j)
    return [sorted(g) for g in groups]


def _identity_layout() -> list[list[int]]:
    return [list(range(s * SUB, (s + 1) * SUB)) for s in range(M)]


def _lloyd_sse(x: np.ndarray, layout: list[list[int]], k: int = 4,
               iters: int = 3) -> float:
    """Deterministic mini-Lloyd per subspace (seeded by k evenly spaced
    lexicographically sorted subvectors), exact-float SSE via fsum."""
    total = 0.0
    for g in layout:
        sv = x[:, g]
        idx = sorted(range(len(sv)), key=lambda i: tuple(sv[i]))
        sel = [idx[int(round(p))] for p in np.linspace(0, len(idx) - 1, k)]
        cents = sv[sel].copy()
        for _ in range(iters):
            d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(1)
            for c in range(k):
                mem = sv[assign == c]
                if len(mem):
                    cents[c] = mem.mean(0)
        d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        total += math.fsum(d2.min(1))
    return total


def _logvar_spread(x: np.ndarray, layout: list[list[int]]) -> float:
    lv = np.log(x.var(axis=0))
    sums = [math.fsum(lv[g]) for g in layout]
    return max(sums) - min(sums)


def test_snake_permutation_valid():
    groups = _snake_allocation(_embeddings())
    assert len(groups) == M
    assert all(len(g) == SUB for g in groups)
    flat = sorted(j for g in groups for j in g)
    assert flat == list(range(D))


def test_snake_follows_exact_integer_ranking():
    x = _embeddings()
    groups = _snake_allocation(x)
    scores = _int_scores(x)
    # independent replay: rank of each dim in the exact-integer order
    order = sorted(range(D), key=lambda j: (-scores[j], j))
    rank_of = {j: i for i, j in enumerate(order)}
    for s, g in enumerate(groups):
        for j in g:
            p, r = divmod(rank_of[j], M)
            expect = r if p % 2 == 0 else M - 1 - r
            assert expect == s, (j, rank_of[j], s)
    # and the scores really are collision-free integers on this data,
    # which is what makes the cross-engine ranking exact
    assert len(set(scores)) == D


def test_balance_improves():
    x = _embeddings()
    ident = _identity_layout()
    for data in (x, _skewed(x)):
        snake = _snake_allocation(data)
        assert _logvar_spread(data, snake) < _logvar_spread(data, ident)


def test_distortion_improves_on_skewed():
    x = _skewed(_embeddings())
    sse_ident = _lloyd_sse(x, _identity_layout())
    sse_snake = _lloyd_sse(x, _snake_allocation(x))
    # measured 8.6% at sf0.001; gate leaves room for testdata regen
    assert sse_snake < sse_ident * 0.98, (sse_snake, sse_ident)


def test_distortion_no_regression_on_raw():
    x = _embeddings()
    sse_ident = _lloyd_sse(x, _identity_layout())
    sse_snake = _lloyd_sse(x, _snake_allocation(x))
    # raw testdata variances are near-uniform, so require only
    # no-meaningful-regression here (measured: a slight improvement)
    assert sse_snake < sse_ident * 1.01, (sse_snake, sse_ident)


def test_bigint_score_bound():
    x = _embeddings()
    amax = float(np.abs(x).max())
    assert amax < 3.3  # unit-ish embeddings; revisit MICRO if this moves
    qmax = int(round(3.3 * MICRO))
    # n rows per dim before n * sum(q^2) can reach 2^63
    n_safe = (2**63 - 1) // (qmax * qmax)
    assert n_safe > 8e9
    # and the actual sf-level scores are nowhere near the edge
    assert max(abs(s) for s in _int_scores(x)) < 2**62
