"""Resumable IVF-PQ index (r15): ``operators.similarity.
build_ivfpq_index`` / ``apply_ivfpq_index`` / ``ivfpq_index_adc_topk``
— the composed member of the persisted-index family, freezing BOTH
quantizers (coarse router + per-subspace residual codebooks) the way
FAISS IndexIVFPQ does at add() time.

The driver rows (``sim_incremental_ivfpq`` /
``sim_incremental_ivfpq_search``) prove ONE base+delta resume against
the from-scratch DuckDB oracle; these tests prove the stronger
contract: a TWO-delta replay — each batch resumed from
parquet-persisted artifacts — reproduces the from-scratch encoding of
the full corpus under the frozen base-trained quantizer pair, resume
is arrival-order-free (assignment is per-vector against broadcast
quantizers), the build's own codes equal the in-query
``ivfpq_residual_codes`` training+assignment, and the multiprobe ADC
read path returns exactly a plain-Python replay with CELL-DEPENDENT
LUTs (the defining IVF-PQ subtlety) over candidates spanning base and
delta.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.similarity import (
    apply_ivfpq_index,
    build_ivfpq_index,
    ivfpq_index_adc_topk,
)


def _triple_set(df):
    return {
        (r["vec_id"], r["cell"], r["subspace"], r["pq_cell"])
        for r in df.collect()
    }


def _frozen_scratch(emb, base):
    """From-scratch encoding of the FULL corpus under the quantizer
    pair trained on ``base`` only — what any resume sequence must
    equal."""
    coarse, cb, _codes = build_ivfpq_index(
        base, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
    )
    return _triple_set(
        apply_ivfpq_index(coarse, cb, emb, m=2, sub_dim=32)
    )


def test_ivfpq_two_delta_resume_equals_frozen_scratch(
    spark, sf_dir, tmp_path
):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK (coarse, codebooks, codes), must reproduce the
    frozen-quantizer from-scratch encoding of the full corpus — both
    float lattices round-trip parquet, the code merge loses nothing."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= c1)
    deltas = [
        emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)),
        emb.filter(F.col("vec_id") > c2),
    ]

    coarse, cb, codes = build_ivfpq_index(
        base, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
    )
    copath = str(tmp_path / "coarse")
    coarse.write.parquet(copath)
    cbpath = str(tmp_path / "codebooks")
    cb.write.parquet(cbpath)
    cpath = str(tmp_path / "codes0")
    codes.write.parquet(cpath)
    for i, d in enumerate(deltas):
        saved_coarse = spark.read.parquet(copath)
        saved_cb = spark.read.parquet(cbpath)
        saved_codes = spark.read.parquet(cpath)
        merged = saved_codes.unionByName(
            apply_ivfpq_index(saved_coarse, saved_cb, d, m=2, sub_dim=32)
        )
        cpath = str(tmp_path / f"codes{i + 1}")
        merged.write.parquet(cpath)

    replay = _triple_set(spark.read.parquet(cpath))
    assert replay == _frozen_scratch(emb, base)
    # every vector routed once and coded exactly once per subspace
    assert len(replay) == emb.count() * 2


def test_ivfpq_resume_is_arrival_order_free(spark, sf_dir, tmp_path):
    """Routing + residual quantization against frozen quantizers is
    per-vector: one big delta equals its two halves applied separately,
    reversed."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 3 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    coarse, cb, _codes = build_ivfpq_index(
        base, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
    )
    copath = str(tmp_path / "coarse")
    coarse.write.parquet(copath)
    cbpath = str(tmp_path / "codebooks")
    cb.write.parquet(cbpath)
    saved_coarse = spark.read.parquet(copath)
    saved_cb = spark.read.parquet(cbpath)

    whole = _triple_set(
        apply_ivfpq_index(saved_coarse, saved_cb, delta, m=2, sub_dim=32)
    )
    mid = (cut + mx) // 2
    hi = emb.filter(F.col("vec_id") > mid)
    lo = emb.filter((F.col("vec_id") > cut) & (F.col("vec_id") <= mid))
    split = set()
    for d in (hi, lo):  # reversed arrival
        split |= _triple_set(
            apply_ivfpq_index(saved_coarse, saved_cb, d, m=2, sub_dim=32)
        )
    assert whole == split


def test_ivfpq_empty_delta_is_identity(spark, sf_dir):
    """A row-free delta appends no codes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coarse, cb, _codes = build_ivfpq_index(
        emb, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
    )
    empty = emb.filter(F.lit(False))
    assert apply_ivfpq_index(coarse, cb, empty, m=2, sub_dim=32).count() == 0


def test_ivfpq_index_codes_match_in_query_training(spark, sf_dir):
    """Codes from ``build_ivfpq_index`` (assigned against its own frozen
    quantizers via the shared apply path) equal ``ivfpq_residual_codes``'
    in-query training+assignment on the same corpus — the freeze changes
    WHEN training happens, never the lattice; the build/apply split
    point is therefore provably arbitrary."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        ivfpq_residual_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _coarse, _cb, codes = build_ivfpq_index(
        emb, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
    )
    got = _triple_set(codes)
    want = {
        (r["vec_id"], r["cell"], r["subspace"], r["pq_cell"])
        for r in ivfpq_residual_codes(
            emb, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
        ).collect()
    }
    assert got == want


def test_ivfpq_index_search_matches_python_adc(spark, sf_dir, tmp_path):
    """``ivfpq_index_adc_topk`` (probe=2) over a resumed index returns,
    per query, exactly the plain-Python multiprobe ADC top-k recomputed
    from the collected quantizers and codes — query residuals and LUTs
    rebuilt PER PROBED CELL, candidates drawn from base AND delta."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    coarse, cb, codes = build_ivfpq_index(
        base, k_coarse=4, m=2, sub_dim=32, k_pq=4, iterations=2
    )
    merged = codes.unionByName(
        apply_ivfpq_index(coarse, cb, delta, m=2, sub_dim=32)
    )
    queries = emb.filter(F.col("vec_id") < 5)
    got = [
        (r["query_id"], r["cand_id"], r["cell"], r["adc"], r["rank"])
        for r in ivfpq_index_adc_topk(
            coarse, cb, merged, queries, m=2, sub_dim=32, topk=3, probe=2
        ).collect()
    ]

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    coarse_c = {r["cell"]: list(r["c"]) for r in coarse.collect()}
    cents = {
        (r["subspace"], r["pq_cell"]): list(r["cent"]) for r in cb.collect()
    }
    cell_of: dict[int, int] = {}
    code_of: dict[int, dict[int, int]] = {}
    for r in merged.collect():
        cell_of[r["vec_id"]] = r["cell"]
        code_of.setdefault(r["vec_id"], {})[r["subspace"]] = r["pq_cell"]
    assert set(code_of) == set(vecs)  # delta codes present

    def d2(a, b):
        # the operator's left fold: acc starts at 0.0, adds in order
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return round(s, 6)

    expected = []
    for qid in range(5):
        qv = vecs[qid]
        probed = sorted(
            coarse_c, key=lambda cl: (d2(qv, coarse_c[cl]), cl)
        )[:2]
        pool = []
        for cl in probed:
            qres = [x - y for x, y in zip(qv, coarse_c[cl])]
            lut = {
                (j, pc): d2(qres[j * 32 : (j + 1) * 32], cents[(j, pc)])
                for j in range(2)
                for pc in {p for (s, p) in cents if s == j}
            }
            for vid, cell in cell_of.items():
                if cell != cl or vid == qid:
                    continue
                adc = round(
                    lut[(0, code_of[vid][0])] + lut[(1, code_of[vid][1])], 6
                )
                pool.append((vid, cell, adc))
        pool.sort(key=lambda t: (t[2], t[0]))
        expected.extend(
            (qid, vid, cell, adc, rank + 1)
            for rank, (vid, cell, adc) in enumerate(pool[:3])
        )
    assert sorted(got) == sorted(expected)
    # candidates span both batches somewhere in the result
    cands = {c for (_q, c, _cell, _a, _r) in got}
    assert any(c <= cut for c in cands) and any(c > cut for c in cands)
