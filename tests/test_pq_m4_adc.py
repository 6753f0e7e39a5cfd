"""m>2 pin for the PQ ADC path (r16, prep for ADVICE r15 #1).

Every registered PQ/IVF-PQ query ships m=2, where the operator's
``sum(d1..d{m-1}) + d0`` fold is bit-exact against any other order by
IEEE commutativity. ADVICE r15 #1 asks for a subspace-order fold so
m>2 can't drift by association order; that change lands in r17 (it
forces 4 driver recheck rows the r16 window can't spare — see
COVERAGE.md). This module pins the m=4 semantics TODAY with a third
implementation (pure-Python replay, the test_ivfpq.py convention), so
the r17 re-association has a value-level regression gate: tolerant on
adc (±2e-6 — two 6dp roundings of differently-associated IEEE sums),
exact on membership and on the (adc, cand_id) ranking order.

Reference for the PQ recipe: Jégou et al., TPAMI 2011 (the operator's
own citation at operators/similarity.py pq_codes docstring).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.similarity import (
    pq_adc_topk,
    pq_codes,
)

M, SUB_DIM, K, ITERS, TOPK = 4, 16, 4, 2, 3


def _python_adc_topk(spark, sf_dir):
    """Pure-Python replay of pq_adc_topk at m=4: collected codes →
    recomputed 6dp-mean centroids → per-query LUTs (sequential
    position-order fold, matching F.aggregate) → subspace-order sum."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    code_rows = pq_codes(
        emb, m=M, sub_dim=SUB_DIM, k=K, iterations=ITERS
    ).collect()
    code_of: dict[int, dict[int, int]] = {}
    for r in code_rows:
        code_of.setdefault(r["vec_id"], {})[r["subspace"]] = r["cell"]

    # recomputed centroids: per (subspace, cell), the 6dp-rounded mean
    # of the members' sub-vectors (the operator's per_dim groupBy-avg)
    cents: dict[tuple[int, int], list[float]] = {}
    for j in range(M):
        members: dict[int, list[list[float]]] = {}
        for i, v in vecs.items():
            members.setdefault(code_of[i][j], []).append(
                v[j * SUB_DIM : (j + 1) * SUB_DIM]
            )
        for cl, ms in members.items():
            cents[(j, cl)] = [
                round(math.fsum(col) / len(ms), 6) for col in zip(*ms)
            ]

    def lut(qv: list[float], j: int, cl: int) -> float:
        # sequential left fold in position order with a 0.0 seed —
        # the exact F.aggregate(zip_with(...)) evaluation order
        acc = 0.0
        mu = cents[(j, cl)]
        for pos in range(SUB_DIM):
            d = qv[j * SUB_DIM + pos] - mu[pos]
            acc += d * d
        return round(acc, 6)

    out: dict[int, list[tuple[float, int]]] = {}
    for qid, qv in vecs.items():
        if qid >= 5:
            continue
        scored = []
        for cid in vecs:
            if cid == qid:
                continue
            total = 0.0
            for j in range(M):  # subspace order — the r17 target fold
                total += lut(qv, j, code_of[cid][j])
            scored.append((round(total, 6), cid))
        scored.sort()
        out[qid] = scored[:TOPK]
    return out


def test_pq_adc_m4_matches_python_replay(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {}
    for r in pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        m=M,
        sub_dim=SUB_DIM,
        k=K,
        iterations=ITERS,
        topk=TOPK,
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["cand_id"], r["adc"])
        )
    want = _python_adc_topk(spark, sf_dir)

    assert set(got) == set(want)
    for qid, rows in got.items():
        rows.sort()
        assert [c for _, c, _ in rows] == [c for _, c in want[qid]], (
            f"query {qid}: ranking diverged — {rows} vs {want[qid]}"
        )
        for (_, _, adc_spark), (adc_py, _) in zip(rows, want[qid]):
            # ±2e-6: both sides round(.,6) a differently-associated
            # IEEE sum (spark folds (d1+d2+d3)+d0 until the r17 fix)
            assert abs(adc_spark - adc_py) <= 2e-6, (
                f"query {qid}: adc {adc_spark} vs {adc_py}"
            )


def test_pq_adc_m4_ranks_are_dense_and_bounded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        m=M,
        sub_dim=SUB_DIM,
        k=K,
        iterations=ITERS,
        topk=TOPK,
    )
    per_q = (
        df.groupBy("query_id")
        .agg(
            F.count("*").alias("n"),
            F.min("rank").alias("lo"),
            F.max("rank").alias("hi"),
            F.count_distinct("cand_id").alias("dc"),
        )
        .collect()
    )
    assert per_q, "no queries returned"
    for r in per_q:
        assert r["n"] == TOPK and r["lo"] == 1 and r["hi"] == TOPK
        assert r["dc"] == TOPK
