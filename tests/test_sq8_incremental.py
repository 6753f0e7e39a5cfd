"""Resumable SQ8 scalar-quantization index (r17 — VERDICT r16 #2):
``operators.similarity.build_sq8_index`` / ``apply_sq8_index`` /
``sq8_index_topk`` + ``delete_from_vector_index`` — the SQ member
completing the FAISS staple set (IVF / PQ / IVF-PQ / SQ) in the
persisted-index family. Public model: faiss ScalarQuantizer QT_8bit.

The driver queries (``sim_incremental_sq8``, ``sim_incremental_sq8_search``)
prove ONE base+delta resume (plus a mod-7 retraction) against the
from-scratch DuckDB oracle; these tests prove the stronger contract the
family always carries: a TWO-delta replay — each batch resumed from
parquet-persisted artifacts — reproduces the from-scratch encode of the
full corpus under the frozen base-trained grid, resume is
arrival-order-free (encode is per-vector), out-of-grid delta values
SATURATE at the uint8 boundary instead of escaping it, deletion equals
scratch-minus-deleted, and the integer search path matches a pure-Python
third implementation EXACTLY (all-integer scoring — no float tolerance
needed, unlike the PQ ADC replay).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.similarity import (
    apply_sq8_index,
    build_sq8_index,
    delete_from_vector_index,
    sq8_encode,
    sq8_index_topk,
)


def _codes_set(df) -> set[tuple[int, tuple[int, ...]]]:
    return {(r["vec_id"], tuple(r["q"])) for r in df.collect()}


def _python_sq8(vecs: dict[int, list[float]], base_ids: set[int]):
    """Pure-Python third implementation: base-trained per-dim min/max
    grid, then the saturated encode of EVERY vector — the exact IEEE
    op order of ``quantize_with_grid`` ((x-lo), (hi-lo), d*255.0/r+0.5,
    floor) so integer codes match Spark bit-for-bit."""
    dims = len(next(iter(vecs.values())))
    lo = [min(vecs[i][d] for i in base_ids) for d in range(dims)]
    hi = [max(vecs[i][d] for i in base_ids) for d in range(dims)]

    def enc(v: list[float]) -> tuple[int, ...]:
        out = []
        for d in range(dims):
            r = hi[d] - lo[d]
            q = int(math.floor((v[d] - lo[d]) * 255.0 / r + 0.5)) if r > 0 else 0
            out.append(max(0, min(255, q)))
        return tuple(out)

    return {i: enc(v) for i, v in vecs.items()}


def test_sq8_two_delta_resume_equals_frozen_scratch(spark, sf_dir, tmp_path):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK (grid, codes), must reproduce the frozen-grid from-scratch
    encode of the full corpus — proving the grid's float lattice
    round-trips parquet losslessly and the append merge loses nothing."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= c1)
    deltas = [
        emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)),
        emb.filter(F.col("vec_id") > c2),
    ]

    grid, codes = build_sq8_index(base)
    gpath = str(tmp_path / "grid")
    grid.write.parquet(gpath)
    codes.write.parquet(str(tmp_path / "codes0"))
    for i, d in enumerate(deltas):
        saved_grid = spark.read.parquet(gpath)
        saved = spark.read.parquet(str(tmp_path / f"codes{i}"))
        merged = saved.unionByName(apply_sq8_index(saved_grid, d))
        merged.write.parquet(str(tmp_path / f"codes{i + 1}"))

    final = spark.read.parquet(str(tmp_path / f"codes{len(deltas)}"))
    scratch = sq8_encode(emb, spark.read.parquet(gpath))
    assert _codes_set(final) == _codes_set(scratch)


def test_sq8_resume_is_arrival_order_free(spark, sf_dir, tmp_path):
    """Encode is per-vector against the frozen grid, so ANY delta
    arrival order yields the identical code set."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= c1)
    d1 = emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2))
    d2 = emb.filter(F.col("vec_id") > c2)

    grid, codes = build_sq8_index(base)
    grid.write.parquet(str(tmp_path / "grid"))
    saved_grid = spark.read.parquet(str(tmp_path / "grid"))
    fwd = codes.unionByName(apply_sq8_index(saved_grid, d1)).unionByName(
        apply_sq8_index(saved_grid, d2)
    )
    rev = codes.unionByName(apply_sq8_index(saved_grid, d2)).unionByName(
        apply_sq8_index(saved_grid, d1)
    )
    assert _codes_set(fwd) == _codes_set(rev)


def test_sq8_empty_delta_is_identity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    grid, codes = build_sq8_index(emb)
    empty = emb.filter(F.lit(False))
    merged = codes.unionByName(apply_sq8_index(grid, empty))
    assert _codes_set(merged) == _codes_set(codes)


def test_sq8_clamp_saturates_out_of_range(spark, sf_dir, tmp_path):
    """Delta values OUTSIDE the base-trained grid must saturate at the
    uint8 boundary (0 below, 255 above) — the codec property that makes
    the frozen grid sound on resume. Forced with a synthetic delta that
    doubles the base max and mirrors below the base min."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    base = emb.filter(F.col("vec_id") <= mx * 4 // 5)
    grid, _ = build_sq8_index(base)
    grid.write.parquet(str(tmp_path / "grid"))
    saved_grid = spark.read.parquet(str(tmp_path / "grid"))

    g = saved_grid.first()
    dims = len(g["mins"])
    hot = [2.0 * g["maxs"][d] + 1.0 for d in range(dims)]
    cold = [g["mins"][d] - abs(g["mins"][d]) - 1.0 for d in range(dims)]
    delta = spark.createDataFrame(
        [(10**9, hot), (10**9 + 1, cold)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r["q"] for r in apply_sq8_index(saved_grid, delta).collect()}
    assert all(q == 255 for q in got[10**9])
    assert all(q == 0 for q in got[10**9 + 1])


def test_sq8_delete_equals_scratch_minus_deleted(spark, sf_dir, tmp_path):
    """Retraction after a build+resume cycle equals a from-scratch
    encode of corpus-minus-deleted under the SAME frozen grid — code
    rows are per-vector, so removing one vector cannot move another's
    code; deleting absent ids is a no-op (idempotent)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cutoff = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cutoff)
    delta = emb.filter(F.col("vec_id") > cutoff)

    grid, codes = build_sq8_index(base)
    grid.write.parquet(str(tmp_path / "grid"))
    saved_grid = spark.read.parquet(str(tmp_path / "grid"))
    merged = codes.unionByName(apply_sq8_index(saved_grid, delta))

    dels = emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    kept = delete_from_vector_index(merged, dels)
    scratch = sq8_encode(
        emb.filter(F.col("vec_id") % 7 != 0), saved_grid
    )
    assert _codes_set(kept) == _codes_set(scratch)
    # idempotent: deleting the same (and absent) ids again is a no-op
    again = delete_from_vector_index(
        kept, dels.unionByName(spark.range(10**9, 10**9 + 3).toDF("vec_id"))
    )
    assert _codes_set(again) == _codes_set(kept)


def test_sq8_search_matches_python_replay_exactly(spark, sf_dir, tmp_path):
    """The integer read path against a pure-Python third implementation
    — EXACT equality (scores are all-integer; no float tolerance), over
    a merged base+delta index resumed from parquet."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cutoff = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cutoff)
    delta = emb.filter(F.col("vec_id") > cutoff)

    grid, codes = build_sq8_index(base)
    grid.write.parquet(str(tmp_path / "grid"))
    codes.write.parquet(str(tmp_path / "codes"))
    saved_grid = spark.read.parquet(str(tmp_path / "grid"))
    saved = spark.read.parquet(str(tmp_path / "codes"))
    merged = saved.unionByName(apply_sq8_index(saved_grid, delta))

    topk = 3
    got = {}
    for r in sq8_index_topk(
        saved_grid, merged, emb.filter(F.col("vec_id") < 5), topk=topk
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["cand_id"], r["qscore"])
        )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    base_ids = {i for i in vecs if i <= cutoff}
    py_codes = _python_sq8(vecs, base_ids)
    want = {}
    for qid in (i for i in vecs if i < 5):
        qq = py_codes[qid]
        scored = sorted(
            (
                -sum(a * b for a, b in zip(qq, cq)),
                cid,
            )
            for cid, cq in py_codes.items()
            if cid != qid
        )
        want[qid] = [
            (rk + 1, cid, -neg) for rk, (neg, cid) in enumerate(scored[:topk])
        ]
    for qid in want:
        assert sorted(got[qid]) == want[qid], (qid, got[qid], want[qid])
    assert set(got) == set(want)
