"""Resumable IVF index (r14): ``operators.similarity.build_ivf_index``
/ ``apply_ivf_index`` / ``ivf_index_topk`` — the vector member of the
persisted-index triad (with the exact and banded-LSH dedup indexes).

The driver query (``sim_incremental_ivf``) proves ONE base+delta resume
against the from-scratch oracle; these tests prove the stronger
contract: a TWO-delta replay — each batch resumed from parquet-persisted
artifacts — reproduces the from-scratch assignment of the full corpus
under the frozen base-trained quantizer, resume is arrival-order-free
(no monotone-id contract needed, unlike the dedup twins: assignment is
per-vector), and the index read path searches exactly the routed cell's
postings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.similarity import (
    _nearest_cell,
    _to_double,
    apply_ivf_index,
    build_ivf_index,
    ivf_index_topk,
    kmeans_centroids,
)


def _frozen_scratch(emb, base):
    """From-scratch assignment of the FULL corpus under the quantizer
    trained on ``base`` only — what any resume sequence must equal."""
    cents = kmeans_centroids(base, k=4, iterations=2).localCheckpoint(
        eager=True
    )
    allv = emb.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    return {
        (r["vec_id"], r["cell"])
        for r in _nearest_cell(allv, cents).select("vec_id", "cell").collect()
    }


def test_two_delta_resume_equals_frozen_scratch(spark, sf_dir, tmp_path):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK (centroids, postings), must reproduce the frozen-quantizer
    from-scratch assignment of the full corpus — proving the centroid
    float lattice round-trips parquet losslessly and the append merge
    loses nothing."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= c1)
    deltas = [
        emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)),
        emb.filter(F.col("vec_id") > c2),
    ]

    cents, post = build_ivf_index(base, k=4, iterations=2)
    cpath = str(tmp_path / "centroids")
    cents.write.parquet(cpath)
    ppath = str(tmp_path / "post0")
    post.write.parquet(ppath)
    for i, d in enumerate(deltas):
        saved_c = spark.read.parquet(cpath)
        saved_p = spark.read.parquet(ppath)
        merged = saved_p.unionByName(apply_ivf_index(saved_c, d))
        ppath = str(tmp_path / f"post{i + 1}")
        merged.write.parquet(ppath)

    replay = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(ppath).collect()
    }
    assert replay == _frozen_scratch(emb, base)
    assert len(replay) == emb.count()  # every vector posted exactly once


def test_resume_is_arrival_order_free(spark, sf_dir, tmp_path):
    """Assignment against frozen centroids is per-vector, so ANY split
    or order of delta arrival yields the same postings: applying one
    big delta equals applying its two halves separately, reversed."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 3 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cents, _post = build_ivf_index(base, k=4, iterations=2)
    cpath = str(tmp_path / "centroids")
    cents.write.parquet(cpath)
    saved_c = spark.read.parquet(cpath)

    whole = {
        (r["vec_id"], r["cell"])
        for r in apply_ivf_index(saved_c, delta).collect()
    }
    mid = (cut + mx) // 2
    hi = emb.filter(F.col("vec_id") > mid)
    lo = emb.filter((F.col("vec_id") > cut) & (F.col("vec_id") <= mid))
    split = {
        (r["vec_id"], r["cell"])
        for d in (hi, lo)  # reversed arrival
        for r in apply_ivf_index(saved_c, d).collect()
    }
    assert whole == split


def test_empty_delta_is_identity(spark, sf_dir):
    """A row-free delta appends nothing."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, _post = build_ivf_index(emb, k=4, iterations=2)
    empty = emb.filter(F.lit(False))
    assert apply_ivf_index(cents, empty).count() == 0


def test_index_search_is_exact_within_routed_cell(spark, sf_dir, tmp_path):
    """``ivf_index_topk`` over a resumed index returns, for each query,
    exactly the brute-force rounded-cosine top-k restricted to the
    query's routed cell — recomputed here in plain Python from the
    collected postings and vectors (independent of the operator's join/
    window machinery), with candidates drawn from base AND delta."""
    import math

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cents, post = build_ivf_index(base, k=4, iterations=2)
    merged = post.unionByName(apply_ivf_index(cents, delta))
    queries = emb.filter(F.col("vec_id") < 5)
    got = [
        (r["query_id"], r["cand_id"], r["cell"], r["cos"], r["rank"])
        for r in ivf_index_topk(cents, merged, emb, queries, k=3).collect()
    ]

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    cell_of = {r["vec_id"]: r["cell"] for r in merged.collect()}
    assert set(cell_of) == set(vecs)  # delta postings present
    cent = {r["cell"]: list(r["c"]) for r in cents.collect()}

    def cos(a, b):
        dot = math.fsum(x * y for x, y in zip(a, b))
        na = math.sqrt(math.fsum(x * x for x in a))
        nb = math.sqrt(math.fsum(x * x for x in b))
        return round(dot / (na * nb), 6)

    expected = []
    for qid in range(5):
        qv = vecs[qid]
        routed = max(
            sorted(cent),
            key=lambda cl: (cos(qv, cent[cl]), -cl),
        )
        cands = sorted(
            (
                (cos(qv, vecs[v]), v)
                for v, cl in cell_of.items()
                if cl == routed and v != qid
            ),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        expected += [
            (qid, v, routed, c, i + 1) for i, (c, v) in enumerate(cands)
        ]
    assert sorted(got) == sorted(expected)


def test_streaming_microbatch_append_equals_batch(spark, sf_dir, tmp_path):
    """The production maintenance loop, driven as a real stream: the
    frozen index is built on the base batch, then the delta arrives as
    a file-stream backlog (2 files, maxFilesPerTrigger=1 → 2
    micro-batches) and foreachBatch appends postings via
    ``apply_ivf_index`` per micro-batch. The accumulated postings must
    equal the one-shot batch apply — and, because assignment is
    per-vector against frozen centroids, this holds for ANY micro-batch
    boundary placement (no monotone-id contract, unlike the dedup
    twins' streaming interop)."""
    import time as _time

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cents, _post = build_ivf_index(base, k=4, iterations=2)
    cpath = str(tmp_path / "centroids")
    cents.write.parquet(cpath)

    backlog = str(tmp_path / "backlog")
    mid = (cut + mx) // 2
    for lo, hi in ((cut, mid), (mid, None)):
        part = delta.filter(F.col("vec_id") > lo)
        if hi is not None:
            part = part.filter(F.col("vec_id") <= hi)
        part.coalesce(1).write.mode("append").parquet(backlog)
        _time.sleep(1.1)  # FileStreamSource mtime ordering is per-second

    out = str(tmp_path / "streamed_postings")

    def _append(bdf, _bid):
        saved_c = bdf.sparkSession.read.parquet(cpath)
        apply_ivf_index(saved_c, bdf).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", "1")
        .parquet(backlog)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(out).collect()
    }
    saved_c = spark.read.parquet(cpath)
    oneshot = {
        (r["vec_id"], r["cell"])
        for r in apply_ivf_index(saved_c, delta).collect()
    }
    assert streamed == oneshot
    assert len(streamed) == delta.count()


def _pq_frozen_scratch(emb, base):
    """From-scratch quantization of the FULL corpus against codebooks
    trained on ``base`` only — what any PQ resume sequence must equal."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        _assign_pq_codes,
        pq_codebooks,
    )

    cb = pq_codebooks(base, m=2, sub_dim=32, k=4, iterations=2).localCheckpoint(
        eager=True
    )
    return {
        (r["vec_id"], r["subspace"], r["cell"])
        for r in _assign_pq_codes(cb, emb, m=2, sub_dim=32).collect()
    }


def test_pq_two_delta_resume_equals_frozen_scratch(spark, sf_dir, tmp_path):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK (codebooks, codes), must reproduce the frozen-codebook
    from-scratch quantization of the full corpus — the PQ twin of the
    IVF two-delta replay (codebook float lattice round-trips parquet,
    the code merge loses nothing)."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        apply_pq_index,
        build_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= c1)
    deltas = [
        emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)),
        emb.filter(F.col("vec_id") > c2),
    ]

    cb, codes = build_pq_index(base, m=2, sub_dim=32, k=4, iterations=2)
    cbpath = str(tmp_path / "codebooks")
    cb.write.parquet(cbpath)
    cpath = str(tmp_path / "codes0")
    codes.write.parquet(cpath)
    for i, d in enumerate(deltas):
        saved_cb = spark.read.parquet(cbpath)
        saved_codes = spark.read.parquet(cpath)
        merged = saved_codes.unionByName(
            apply_pq_index(saved_cb, d, m=2, sub_dim=32)
        )
        cpath = str(tmp_path / f"codes{i + 1}")
        merged.write.parquet(cpath)

    replay = {
        (r["vec_id"], r["subspace"], r["cell"])
        for r in spark.read.parquet(cpath).collect()
    }
    assert replay == _pq_frozen_scratch(emb, base)
    # every vector coded exactly once per subspace
    assert len(replay) == emb.count() * 2


def test_pq_resume_is_arrival_order_free(spark, sf_dir, tmp_path):
    """Quantization against frozen codebooks is per-vector: one big
    delta equals its two halves applied separately, reversed."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        apply_pq_index,
        build_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 3 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cb, _codes = build_pq_index(base, m=2, sub_dim=32, k=4, iterations=2)
    cbpath = str(tmp_path / "codebooks")
    cb.write.parquet(cbpath)
    saved_cb = spark.read.parquet(cbpath)

    whole = {
        (r["vec_id"], r["subspace"], r["cell"])
        for r in apply_pq_index(saved_cb, delta, m=2, sub_dim=32).collect()
    }
    mid = (cut + mx) // 2
    hi = emb.filter(F.col("vec_id") > mid)
    lo = emb.filter((F.col("vec_id") > cut) & (F.col("vec_id") <= mid))
    split = {
        (r["vec_id"], r["subspace"], r["cell"])
        for d in (hi, lo)  # reversed arrival
        for r in apply_pq_index(saved_cb, d, m=2, sub_dim=32).collect()
    }
    assert whole == split


def test_pq_empty_delta_is_identity(spark, sf_dir):
    """A row-free delta appends no codes."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        apply_pq_index,
        build_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb, _codes = build_pq_index(emb, m=2, sub_dim=32, k=4, iterations=2)
    empty = emb.filter(F.lit(False))
    assert apply_pq_index(cb, empty, m=2, sub_dim=32).count() == 0


def test_pq_index_codes_match_in_query_training(spark, sf_dir):
    """Codes assigned against ``pq_codebooks``' frozen artifact equal
    ``pq_codes``' in-query training+assignment on the same corpus —
    the freeze changes WHEN training happens, never the lattice."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        build_pq_index,
        pq_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _cb, codes = build_pq_index(emb, m=2, sub_dim=32, k=4, iterations=2)
    got = {
        (r["vec_id"], r["subspace"], r["cell"]) for r in codes.collect()
    }
    want = {
        (r["vec_id"], r["subspace"], r["cell"])
        for r in pq_codes(emb, m=2, sub_dim=32, k=4, iterations=2).collect()
    }
    assert got == want


def test_pq_index_search_matches_python_adc(spark, sf_dir, tmp_path):
    """``pq_index_adc_topk`` over a resumed index returns, per query,
    exactly the plain-Python ADC top-k recomputed from the collected
    codebooks and codes (independent of the operator's join/window
    machinery), with candidates drawn from base AND delta."""
    import math

    from gisaid_pipeline_functions_spark.operators.similarity import (
        apply_pq_index,
        build_pq_index,
        pq_index_adc_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cb, codes = build_pq_index(base, m=2, sub_dim=32, k=4, iterations=2)
    merged = codes.unionByName(apply_pq_index(cb, delta, m=2, sub_dim=32))
    queries = emb.filter(F.col("vec_id") < 5)
    got = [
        (r["query_id"], r["cand_id"], r["adc"], r["rank"])
        for r in pq_index_adc_topk(
            cb, merged, queries, m=2, sub_dim=32, topk=3
        ).collect()
    ]

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    cents = {
        (r["subspace"], r["cell"]): list(r["cent"]) for r in cb.collect()
    }
    code_of: dict[int, dict[int, int]] = {}
    for r in merged.collect():
        code_of.setdefault(r["vec_id"], {})[r["subspace"]] = r["cell"]
    assert set(code_of) == set(vecs)  # delta codes present

    def d2(a, b):
        return round(math.fsum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    expected = []
    for qid in range(5):
        qv = vecs[qid]
        lut = {
            (j, cl): d2(qv[j * 32 : (j + 1) * 32], cents[(j, cl)])
            for (j, cl) in cents
        }
        cands = sorted(
            (
                (
                    round(lut[(0, cd[0])] + lut[(1, cd[1])], 6),
                    v,
                )
                for v, cd in code_of.items()
                if v != qid
            ),
            key=lambda t: (t[0], t[1]),
        )[:3]
        expected += [(qid, v, a, i + 1) for i, (a, v) in enumerate(cands)]
    assert sorted(got) == sorted(expected)


def test_vector_index_delete_equals_frozen_scratch_minus_deleted(
    spark, sf_dir, tmp_path
):
    """Deleting a batch from the merged IVF postings equals a
    from-scratch assignment of corpus-minus-deleted under the same
    frozen quantizer — per-vector rows mean retraction cannot move any
    survivor's cell (no keeper re-election, unlike the dedup twins)."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        delete_from_vector_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cents, base_post = build_ivf_index(base, k=4, iterations=2)
    cpath = str(tmp_path / "centroids")
    cents.write.parquet(cpath)
    saved = spark.read.parquet(cpath)
    merged = base_post.unionByName(apply_ivf_index(saved, delta))

    dels = emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    kept = {
        (r["vec_id"], r["cell"])
        for r in delete_from_vector_index(merged, dels).collect()
    }
    # from-scratch under the SAME frozen quantizer, corpus minus deleted
    survivors = emb.filter(F.col("vec_id") % 7 != 0)
    want = {
        (r["vec_id"], r["cell"])
        for r in apply_ivf_index(saved, survivors).collect()
    }
    assert kept == want
    assert kept and all(v % 7 != 0 for v, _c in kept)


def test_vector_index_delete_idempotent_and_composes(spark, sf_dir):
    """Unknown-id retraction is a no-op; delete-then-append equals
    append-then-delete (the anti-join and the per-vector append
    commute when the sets are disjoint)."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        delete_from_vector_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)

    cents, base_post = build_ivf_index(base, k=4, iterations=2)

    # unknown ids (beyond the corpus) delete nothing
    ghost = spark.range(mx + 100, mx + 120).select(
        F.col("id").alias("vec_id")
    )
    same = delete_from_vector_index(base_post, ghost)
    assert same.count() == base_post.count()

    # delete base ids ≡ 0 (mod 7), then append the delta — vs append
    # first, delete after: identical posting sets
    dels = base.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    d_then_a = delete_from_vector_index(base_post, dels).unionByName(
        apply_ivf_index(cents, delta)
    )
    a_then_d = delete_from_vector_index(
        base_post.unionByName(apply_ivf_index(cents, delta)), dels
    )
    lhs = {(r["vec_id"], r["cell"]) for r in d_then_a.collect()}
    rhs = {(r["vec_id"], r["cell"]) for r in a_then_d.collect()}
    assert lhs == rhs


def test_vector_index_delete_empties_cell(spark, sf_dir):
    """Deleting EVERY member of a cell removes the cell from the
    postings entirely (the groupBy consumer sees no ghost rows), and
    every other cell is untouched — the vector-index analog of the
    dedup twins' bucket-emptied case."""
    from gisaid_pipeline_functions_spark.operators.similarity import (
        delete_from_vector_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _cents, post = build_ivf_index(emb, k=4, iterations=2)
    post = post.localCheckpoint(eager=True)
    target = post.groupBy("cell").count().orderBy("count", "cell").first()[
        "cell"
    ]
    dels = post.filter(F.col("cell") == target).select("vec_id")
    kept = delete_from_vector_index(post, dels).collect()
    assert all(r["cell"] != target for r in kept)
    want = {
        (r["vec_id"], r["cell"])
        for r in post.filter(F.col("cell") != target).collect()
    }
    assert {(r["vec_id"], r["cell"]) for r in kept} == want
