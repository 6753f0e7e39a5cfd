"""Property tests for the round-9 continued-session operators:
best-fit-decreasing packing invariants and the block-prefix 2-D
skyline against an O(n^2) brute force. The oracle parity tests
(test_queries_oracle.py) check cross-engine agreement; these check the
ALGORITHMS' defining properties on adversarial synthetic inputs the
testdata distribution never produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.topk import skyline_2d
from gisaid_pipeline_functions_spark.operators.training import (
    pack_best_fit,
)

BUDGET = 50


def _pack(spark, sizes):
    df = spark.createDataFrame(
        [("s", i, int(t)) for i, t in enumerate(sizes)],
        "source string, doc_id long, n_tokens long",
    )
    out = pack_best_fit(
        df, "source", "doc_id", "n_tokens", budget=BUDGET, shards=1
    )
    return out.collect()


@pytest.mark.parametrize(
    "sizes",
    [
        [10, 20, 30, 40, 50, 5, 5, 5],
        [50] * 6,                      # exact-fit singletons
        [60, 70, 10],                  # oversized docs get own bins
        [25, 25, 25, 25, 1],           # pairwise exact fills + straggler
        list(range(1, 40)),
    ],
)
def test_bfd_invariants(spark, sizes):
    rows = _pack(spark, sizes)
    assert len(rows) == len(sizes)                      # every doc assigned
    fills: dict[int, int] = {}
    for r in rows:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
    for b, f in fills.items():
        members = [r.n_tokens for r in rows if r.bin_id == b]
        # a bin over budget must be a single oversized doc
        assert f <= BUDGET or (len(members) == 1 and members[0] > BUDGET)
    # bin ids are 1..k dense
    assert sorted(fills) == list(range(1, len(fills) + 1))


def test_bfd_replays_reference_walk(spark):
    # independent python replay of BFD (sort desc, best-fit, ties ->
    # lowest bin) on a fixed input — the operator must agree row-level
    sizes = [30, 20, 20, 10, 45, 5, 50, 26]
    rows = {r.doc_id: r.bin_id for r in _pack(spark, sizes)}
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    fills: list[int] = []
    expect = {}
    for i in order:
        t = sizes[i]
        best, best_fill = -1, -1
        for b, f in enumerate(fills):
            if f + t <= BUDGET and f > best_fill:
                best, best_fill = b, f
        if best < 0:
            fills.append(t)
            expect[i] = len(fills)
        else:
            fills[best] += t
            expect[i] = best + 1
    assert rows == expect


def _brute_skyline(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (qx >= x and qy <= y and (qx > x or qy < y))
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append(i)
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_skyline_matches_bruteforce(spark, seed):
    import random

    rng = random.Random(seed)
    # small coordinate range forces heavy ties on both dims
    pts = [(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(120)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "pid long, x long, y long",
    )
    got = sorted(r.pid for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute_skyline(pts)
