"""m>2 pin for the PQ ADC path (r16, prep for ADVICE r15 #1).

Every registered PQ/IVF-PQ query ships m=2, where the operator's
``sum(d1..d{m-1}) + d0`` fold is bit-exact against any other order by
IEEE commutativity. ADVICE r15 #1 asks for a subspace-order fold so
m>2 can't drift by association order; that change lands in r17 (it
forces 4 driver recheck rows the r16 window can't spare — see
COVERAGE.md). This module pins the m=4 semantics TODAY with a third
implementation (pure-Python replay, the test_ivfpq.py convention) so
the r17 re-association has a value-level regression gate.

Tolerance design (r16 review findings): the replay computes centroid
means with exact ``math.fsum`` while the operator uses engine-ordered
``F.avg`` — a member mean landing on a .5e-7 decimal boundary can
round to a 6dp centroid differing by 1e-6, shifting a LUT entry by up
to ~1e-5 (the r9 anova/chi2 engine-ordered-sum trap class), on top of
the two 6dp roundings of differently-associated adc sums. So the gate
is TOLERANT, not exact: adc within ±TOL per matched candidate (TOL
derived from m·per-entry drift plus rounding margin — see the
constants), and top-k membership up to near-ties within ±2·TOL of
the replay's k-th distance (both the candidate and the k-th anchor
can drift by TOL independently). A real fold bug (dropped/duplicated
subspace, wrong LUT key) errs at lattice scale (>>1e-3) and still
fails; a legitimate near-tie reorder after a testdata regen does not.

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
from gisaid_pipeline_functions_spark.sources.tables import load_table

M, SUB_DIM, K, ITERS, TOPK = 4, 16, 4, 2, 3
# Per-candidate drift budget, DERIVED so the headroom is explicit
# (ADVICE r16 #1): each of the m LUT entries can shift by up to
# ~PER_ENTRY_DRIFT when an engine-ordered centroid mean rounds across
# a .5e-7 decimal boundary (see module docstring), plus one extra
# PER_ENTRY_DRIFT of slack for the two 6dp roundings of the
# differently-associated sums — so an m=4 candidate drifting the full
# ~4e-5 sits comfortably inside the gate instead of saturating it.
PER_ENTRY_DRIFT = 1e-5
TOL = (M + 1) * PER_ENTRY_DRIFT  # = 5e-5 at m=4
# Membership/clear-winner bands are TWICE the per-candidate gate:
# Spark can drift a candidate by ±TOL and the k-th replay distance
# itself is only pinned to ±TOL, so two candidates can legitimately
# swap when their replay adcs differ by up to 2*TOL (ADVICE r16 #1 —
# the r16 one-sided band under-allowed exactly that).
SWAP = 2 * TOL


def _python_adc_all(spark, sf_dir):
    """Pure-Python replay of the m=4 ADC scoring: collected codes →
    recomputed 6dp-mean centroids → per-query LUTs (sequential
    position-order fold, matching F.aggregate) → subspace-order sum.
    Returns {query_id: {cand_id: adc}} over ALL candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
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

    out: dict[int, dict[int, float]] = {}
    for qid, qv in vecs.items():
        if qid >= 5:
            continue
        scored: dict[int, float] = {}
        for cid in vecs:
            if cid == qid:
                continue
            total = 0.0
            for j in range(M):  # subspace order — the r17 target fold
                total += lut(qv, j, code_of[cid][j])
            scored[cid] = round(total, 6)
        out[qid] = scored
    return out


def test_pq_adc_m4_matches_python_replay(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got: dict[int, list[tuple[int, int, float]]] = {}
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
    want = _python_adc_all(spark, sf_dir)

    assert set(got) == set(want)
    for qid, rows in got.items():
        rows.sort()
        scored = sorted((adc, cid) for cid, adc in want[qid].items())
        kth = scored[TOPK - 1][0]
        # every returned candidate matches its replay adc within TOL…
        for rank, cand, adc_spark in rows:
            assert cand in want[qid]
            assert abs(adc_spark - want[qid][cand]) <= TOL, (
                f"query {qid} cand {cand}: adc {adc_spark} vs "
                f"{want[qid][cand]}"
            )
        # …is inside the near-tie band of the replay's k-th distance…
        allowed = {cid for adc, cid in scored if adc <= kth + SWAP}
        assert {c for _, c, _ in rows} <= allowed, (
            f"query {qid}: candidate outside the top-{TOPK} near-tie "
            f"band — {rows} vs replay {scored[: TOPK + 2]}"
        )
        # …every clear (non-near-tie) replay winner is present…
        must = {cid for adc, cid in scored if adc < kth - SWAP}
        assert must <= {c for _, c, _ in rows}, (
            f"query {qid}: clear winner missing — {rows} vs replay "
            f"{scored[: TOPK + 2]}"
        )
        # …and spark's own ranking is non-decreasing in adc
        adcs = [a for _, _, a in rows]
        assert adcs == sorted(adcs)


def test_pq_adc_m4_ranks_are_dense_and_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
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
