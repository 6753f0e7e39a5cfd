"""Resumable batch LSH dedup (VERDICT r10 #5 / r11 #3):
``operators.dedup.build_lsh_band_index`` / ``apply_lsh_band_index``.

The driver query (``dedup_incremental_index``) proves ONE base+delta
resume against the from-scratch oracle; these tests prove the stronger
contract the capability actually claims: a TWO-delta replay — each
batch resumed from the previous batch's parquet-persisted index —
reproduces both the from-scratch drop set AND the from-scratch
compacted index, and the index round-trips through disk losslessly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.dedup import (
    apply_lsh_band_index,
    build_lsh_band_index,
)
from gisaid_pipeline_functions_spark.streaming.lsh import band_signatures

INDEX_SCHEMA = "band int, sig string, keeper long"


def _from_scratch(docs):
    """The greedy bucket-min rule over the full corpus in one pass —
    the same semantics the streaming twin and the driver oracle use."""
    bands = band_signatures(docs)
    mins = bands.groupBy("band", "sig").agg(F.min("doc_id").alias("keeper"))
    drops = {
        r["doc_id"]
        for r in bands.join(mins, ["band", "sig"])
        .filter(F.col("doc_id") > F.col("keeper"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    index = {(r["band"], r["sig"], r["keeper"]) for r in mins.collect()}
    return drops, index


def test_two_delta_resume_equals_from_scratch(spark, sf_dir, tmp_path):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK index, must reproduce the from-scratch drop set and the
    from-scratch compacted index exactly (append-only id contract:
    batches split at ascending id cutoffs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    batches = [
        docs.filter(F.col("doc_id") <= c1),
        docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        docs.filter(F.col("doc_id") > c2),
    ]

    cur_path = None
    replay_drops: set[int] = set()
    for i, batch in enumerate(batches):
        saved = (
            spark.read.parquet(cur_path)
            if cur_path
            else spark.createDataFrame([], INDEX_SCHEMA)
        )
        drops, updated = apply_lsh_band_index(saved, batch)
        replay_drops |= {r["doc_id"] for r in drops.collect()}
        cur_path = str(tmp_path / f"idx{i}")
        updated.write.parquet(cur_path)

    scratch_drops, scratch_index = _from_scratch(docs)
    assert replay_drops == scratch_drops
    final_index = {
        (r["band"], r["sig"], r["keeper"])
        for r in spark.read.parquet(cur_path).collect()
    }
    assert final_index == scratch_index


def test_build_index_roundtrips_and_matches_bands(spark, sf_dir, tmp_path):
    """build_lsh_band_index is exactly the per-bucket min of the map-side
    band signatures, and survives a parquet write→read bit-identically
    (the artifact the resume path consumes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_lsh_band_index(docs)
    expected = {
        (r["band"], r["sig"], r["keeper"])
        for r in band_signatures(docs)
        .groupBy("band", "sig")
        .agg(F.min("doc_id").alias("keeper"))
        .collect()
    }
    assert {
        (r["band"], r["sig"], r["keeper"]) for r in idx.collect()
    } == expected
    p = str(tmp_path / "idx")
    idx.write.parquet(p)
    back = spark.read.parquet(p)
    assert {
        (r["band"], r["sig"], r["keeper"]) for r in back.collect()
    } == expected


def test_empty_delta_is_identity(spark, sf_dir):
    """A delta with no rows (or no shingle-bearing docs) drops nothing
    and leaves the index unchanged — the no-new-data resume."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_lsh_band_index(docs)
    empty = docs.filter(F.lit(False))
    drops, updated = apply_lsh_band_index(idx, empty)
    assert drops.count() == 0
    assert updated.exceptAll(idx).count() == 0
    assert idx.exceptAll(updated).count() == 0


# ---- hypothesis properties: resume ≡ from-scratch on ARBITRARY corpora

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# tiny alphabet → heavy bucket collisions; '' produces double/trailing
# spaces and sub-k docs (no band rows at all — batches can be entirely
# signature-free, the edge the parquet corpus never hits)
_WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e", ""])
_TEXT = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)


@given(
    texts=st.lists(_TEXT, min_size=1, max_size=12),
    cut_fracs=st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
)
@settings(**_SETTINGS)
def test_resume_equals_from_scratch_on_any_corpus(spark, texts, cut_fracs):
    """For ANY corpus and ANY two ascending-id split points (possibly
    empty batches), the two-delta index replay reproduces the
    from-scratch bucket-min drop set and compacted index exactly."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    c1, c2 = sorted((min(cut_fracs), max(cut_fracs)))
    batches = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        docs.filter(F.col("doc_id") >= c2),
    ]
    cur = spark.createDataFrame([], INDEX_SCHEMA)
    replay_drops: set[int] = set()
    for batch in batches:
        drops, cur = apply_lsh_band_index(cur, batch)
        replay_drops |= {r["doc_id"] for r in drops.collect()}
        # materialize the index between batches — the persisted-artifact
        # boundary (localCheckpoint stands in for the parquet round trip,
        # which test_two_delta_resume_equals_from_scratch covers on disk)
        cur = cur.localCheckpoint(eager=True)

    bands = band_signatures(docs)
    mins = bands.groupBy("band", "sig").agg(F.min("doc_id").alias("keeper"))
    scratch_drops = {
        r["doc_id"]
        for r in bands.join(mins, ["band", "sig"])
        .filter(F.col("doc_id") > F.col("keeper"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert replay_drops == scratch_drops
    assert {
        (r["band"], r["sig"], r["keeper"]) for r in cur.collect()
    } == {(r["band"], r["sig"], r["keeper"]) for r in mins.collect()}


@given(
    texts=st.lists(_TEXT, min_size=2, max_size=12),
    cut=st.integers(min_value=1, max_value=11),
)
@settings(**_SETTINGS)
def test_index_is_order_free_even_for_non_monotone_deltas(
    spark, texts, cut
):
    """The drop DECISIONS require the append-only id contract, but the
    UPDATED INDEX is a pure bucket-min — order-free by construction. Feed
    the batches in REVERSED id order (every delta id smaller than every
    indexed id — the contract's worst violation): the final index must
    still equal the from-scratch bucket-min over all docs, so a resumed
    pipeline's state never corrupts even if an out-of-order backfill
    sneaks in (only that backfill's keep/drop calls differ)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    c = min(cut, len(texts) - 1)
    high_first = [
        docs.filter(F.col("doc_id") >= c),
        docs.filter(F.col("doc_id") < c),
    ]
    cur = spark.createDataFrame([], INDEX_SCHEMA)
    for batch in high_first:
        _drops, cur = apply_lsh_band_index(cur, batch)
        cur = cur.localCheckpoint(eager=True)
    bands = band_signatures(docs)
    mins = bands.groupBy("band", "sig").agg(F.min("doc_id").alias("keeper"))
    assert {
        (r["band"], r["sig"], r["keeper"]) for r in cur.collect()
    } == {(r["band"], r["sig"], r["keeper"]) for r in mins.collect()}


# ---- the EXACT-dedup index twin (VERDICT r12 #4) -----------------------

from gisaid_pipeline_functions_spark.operators.dedup import (  # noqa: E402
    apply_exact_dedup_index,
    build_exact_dedup_index,
)

EXACT_SCHEMA = "fingerprint string, keeper_id long, n_copies long"


def _exact_from_scratch(docs):
    """keeper = min id per md5(text), n_copies = full-corpus count —
    the same semantics the driver oracle (dedup_incremental_exact) runs
    in DuckDB."""
    idx = build_exact_dedup_index(docs)
    index = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in idx.collect()
    }
    fp = docs.select(
        "doc_id", F.md5(F.col("text")).alias("fingerprint")
    )
    drops = {
        r["doc_id"]
        for r in fp.join(idx, "fingerprint")
        .filter(F.col("doc_id") > F.col("keeper_id"))
        .select("doc_id")
        .collect()
    }
    return drops, index


def test_exact_two_delta_resume_equals_from_scratch(spark, sf_dir, tmp_path):
    """base + delta1 + delta2, each resumed from the previous batch's
    ON-DISK fingerprint index, must reproduce the from-scratch drop set
    AND the from-scratch (fingerprint, keeper, n_copies) index exactly —
    keeper minima AND copy counts both merge losslessly (append-only id
    contract: batches split at ascending id cutoffs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    c1, c2 = mx * 3 // 5, mx * 4 // 5
    batches = [
        docs.filter(F.col("doc_id") <= c1),
        docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        docs.filter(F.col("doc_id") > c2),
    ]

    cur_path = None
    replay_drops: set[int] = set()
    for i, batch in enumerate(batches):
        saved = (
            spark.read.parquet(cur_path)
            if cur_path
            else spark.createDataFrame([], EXACT_SCHEMA)
        )
        drops, updated = apply_exact_dedup_index(saved, batch)
        replay_drops |= {r["doc_id"] for r in drops.collect()}
        cur_path = str(tmp_path / f"xidx{i}")
        updated.write.parquet(cur_path)

    scratch_drops, scratch_index = _exact_from_scratch(docs)
    assert replay_drops == scratch_drops
    final_index = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in spark.read.parquet(cur_path).collect()
    }
    assert final_index == scratch_index


def test_exact_empty_delta_is_identity(spark, sf_dir):
    """A row-free delta drops nothing and leaves the index (keepers AND
    counts) unchanged — the no-new-data resume."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_exact_dedup_index(docs).select(
        "fingerprint", "keeper_id", "n_copies"
    )
    empty = docs.filter(F.lit(False))
    drops, updated = apply_exact_dedup_index(idx, empty)
    assert drops.count() == 0
    assert updated.exceptAll(idx).count() == 0
    assert idx.exceptAll(updated).count() == 0


@given(
    texts=st.lists(_TEXT, min_size=1, max_size=12),
    cut_fracs=st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
)
@settings(**_SETTINGS)
def test_exact_resume_equals_from_scratch_on_any_corpus(
    spark, texts, cut_fracs
):
    """For ANY corpus (duplicate-heavy tiny alphabet, empty texts) and
    ANY two ascending-id split points (possibly empty batches), the
    two-delta exact-index replay reproduces the from-scratch keeper set
    and copy counts exactly."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    c1, c2 = sorted((min(cut_fracs), max(cut_fracs)))
    batches = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        docs.filter(F.col("doc_id") >= c2),
    ]
    cur = spark.createDataFrame([], EXACT_SCHEMA)
    replay_drops: set[int] = set()
    for batch in batches:
        drops, cur = apply_exact_dedup_index(cur, batch)
        replay_drops |= {r["doc_id"] for r in drops.collect()}
        cur = cur.localCheckpoint(eager=True)

    scratch_drops, scratch_index = _exact_from_scratch(docs)
    assert replay_drops == scratch_drops
    assert {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in cur.collect()
    } == scratch_index


@given(
    texts=st.lists(_TEXT, min_size=2, max_size=12),
    cut=st.integers(min_value=1, max_value=11),
)
@settings(**_SETTINGS)
def test_exact_index_is_order_free_even_for_non_monotone_deltas(
    spark, texts, cut
):
    """Like the banded twin: drop DECISIONS require the append-only id
    contract, but the UPDATED INDEX is a pure per-fingerprint (min, sum)
    — both commutative — so an out-of-order backfill can corrupt only
    its own keep/drop calls, never the persisted state. Feed the batches
    in REVERSED id order (every delta id smaller than every indexed id):
    the final index must equal the from-scratch one exactly, keepers AND
    counts."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    c = min(cut, len(texts) - 1)
    high_first = [
        docs.filter(F.col("doc_id") >= c),
        docs.filter(F.col("doc_id") < c),
    ]
    cur = spark.createDataFrame([], EXACT_SCHEMA)
    for batch in high_first:
        _drops, cur = apply_exact_dedup_index(cur, batch)
        cur = cur.localCheckpoint(eager=True)
    _, scratch_index = _exact_from_scratch(docs)
    assert {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in cur.collect()
    } == scratch_index


def test_exact_index_matches_streaming_state(spark, sf_dir, tmp_path):
    """Batch/stream interop for the exact family: the persisted batch
    index (build_exact_dedup_index) and the streaming GroupState
    (streaming.dedup.streaming_first_seen) must agree row-for-row —
    keeper = min id, count = full-corpus occurrences — so an index built
    by either path resumes the other. The backlog is forced through
    MULTIPLE micro-batches (maxFilesPerTrigger=1) so cross-batch state
    merge, not single-batch aggregation, is what is being compared.

    The backlog honors the SAME append-only ascending-id arrival
    contract the index resume documents: streaming first-seen keeps the
    first ARRIVAL, so first-seen ≡ min-id — and batch-index ≡
    streaming-state — exactly under that contract (a shuffled arrival
    order flips keepers to whichever copy landed first; counts still
    agree). FileStreamSource orders files by modification time, and
    path order among same-mtime files is NOT stable across sessions
    (observed both orders), so each id-range batch is APPENDED
    sequentially with distinct mtimes."""
    import time as _time

    from gisaid_pipeline_functions_spark.streaming.dedup import (
        streaming_first_seen,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = docs.unionByName(dup)
    backlog = str(tmp_path / "backlog")
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    cuts = [(None, mx // 2), (mx // 2, mx), (mx, 1_000_000 + mx // 2),
            (1_000_000 + mx // 2, None)]
    for lo, hi in cuts:
        part = corpus
        if lo is not None:
            part = part.filter(F.col("doc_id") > lo)
        if hi is not None:
            part = part.filter(F.col("doc_id") <= hi)
        part.coalesce(1).write.mode("append").parquet(backlog)
        _time.sleep(1.1)  # FileStreamSource mtime ordering is per-second

    batch_index = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in build_exact_dedup_index(corpus).collect()
    }

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(backlog)
    q = (
        streaming_first_seen(stream)
        .writeStream.format("memory")
        .queryName("exact_interop_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final: dict[str, tuple] = {}
    for r in spark.sql("SELECT * FROM exact_interop_test").collect():
        prev = final.get(r["fingerprint"])
        # n_dupes_dropped grows monotonically across updates — the max
        # is the final state, independent of sink row order
        if prev is None or r["n_dupes_dropped"] > prev[1]:
            final[r["fingerprint"]] = (r["keeper_id"], r["n_dupes_dropped"])
    stream_index = {
        (fp, keeper, dropped + 1) for fp, (keeper, dropped) in final.items()
    }
    assert stream_index == batch_index


def test_cleanup_handle_releases_per_batch_caches(spark, sf_dir):
    """ADVICE r13: both index appliers persist() their delta frame (two
    consumers — the merge groupBy and the drops-join probe side), but
    return LAZY frames, so a long-lived incremental session calling them
    once per delta batch accumulates dead caches. The ``cleanup``
    out-param is the release path: after materializing both outputs,
    unpersisting its entries leaves nothing cached."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    base = docs.filter(F.col("doc_id") <= mx // 2)
    delta = docs.filter(F.col("doc_id") > mx // 2)

    for build, apply in (
        (build_lsh_band_index, apply_lsh_band_index),
        (build_exact_dedup_index, apply_exact_dedup_index),
    ):
        handles: list = []
        drops, updated = apply(build(base), delta, cleanup=handles)
        drops.count(), updated.count()  # materialize both consumers
        assert len(handles) == 1 and handles[0].is_cached
        for h in handles:
            h.unpersist()
        assert not handles[0].is_cached


# ---------------------------------------------------------------------------
# Deletion / retraction (r15 — VERDICT r14 #4)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_delete_reelects_next_lowest_survivor(spark):
    """Crafted micro-case: bucket {1, 4, 9} loses keeper 1 → keeper
    must become 4 with n_copies 2; bucket {2} fully deleted →
    disappears; bucket {3} untouched → passes through byte-identical."""
    from gisaid_pipeline_functions_spark.operators.dedup import (
        delete_from_exact_dedup_index,
        exact_dedup_postings,
    )

    docs = _mk_docs(
        spark,
        [(1, "aa"), (4, "aa"), (9, "aa"), (2, "bb"), (3, "cc")],
    )
    post = exact_dedup_postings(docs)
    index = post.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    dels = _mk_docs(spark, [(1, ""), (2, "")]).select("doc_id")
    upd_index, upd_post = delete_from_exact_dedup_index(index, post, dels)

    got = {
        r["keeper_id"]: r["n_copies"] for r in upd_index.collect()
    }
    assert got == {4: 2, 3: 1}
    assert {r["doc_id"] for r in upd_post.collect()} == {4, 9, 3}


def test_exact_delete_equals_from_scratch_minus_deleted(spark, sf_dir):
    """Over the real corpus: deleting every multi-copy bucket's keeper
    plus a slice of other docs leaves an index identical to building
    from scratch on corpus-minus-deleted."""
    from gisaid_pipeline_functions_spark.operators.dedup import (
        delete_from_exact_dedup_index,
        exact_dedup_postings,
        exact_duplicates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    post = exact_dedup_postings(docs).localCheckpoint(eager=True)
    index = post.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    dels = (
        index.filter(F.col("n_copies") >= 2)
        .select(F.col("keeper_id").alias("doc_id"))
        .unionByName(
            docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    upd_index, _p = delete_from_exact_dedup_index(index, post, dels)
    got = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in upd_index.collect()
    }
    survivors = docs.join(dels, "doc_id", "left_anti")
    want = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in exact_duplicates(survivors, "doc_id", "text").collect()
    }
    assert got == want


def test_exact_delete_unknown_ids_is_identity(spark, sf_dir):
    """Retracting ids absent from the postings changes nothing
    (idempotent retraction — re-delivered DMCA notices are normal)."""
    from gisaid_pipeline_functions_spark.operators.dedup import (
        delete_from_exact_dedup_index,
        exact_dedup_postings,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    post = exact_dedup_postings(docs).localCheckpoint(eager=True)
    index = post.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    ghost = _mk_docs(spark, [(mx + 101, ""), (mx + 202, "")]).select(
        "doc_id"
    )
    upd_index, upd_post = delete_from_exact_dedup_index(index, post, ghost)
    assert sorted(map(tuple, upd_index.collect())) == sorted(
        map(tuple, index.collect())
    )
    assert upd_post.count() == post.count()


def test_lsh_delete_equals_from_scratch_minus_deleted(spark, sf_dir):
    """Banded twin over the real corpus: delete every ≥2-member
    bucket's min id plus a slice; the updated compacted index equals
    build_lsh_band_index over corpus-minus-deleted."""
    from gisaid_pipeline_functions_spark.operators.dedup import (
        build_lsh_band_index,
        delete_from_lsh_band_index,
        lsh_band_stack,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    post = lsh_band_stack(docs).localCheckpoint(eager=True)
    index = post.groupBy("band", "sig").agg(F.min("doc_id").alias("keeper"))
    stats = post.groupBy("band", "sig").agg(
        F.min("doc_id").alias("k"), F.count(F.lit(1)).alias("n")
    )
    dels = (
        stats.filter(F.col("n") >= 2)
        .select(F.col("k").alias("doc_id"))
        .unionByName(
            docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    upd_index, upd_post = delete_from_lsh_band_index(index, post, dels)
    got = {
        (r["band"], r["sig"], r["keeper"]) for r in upd_index.collect()
    }
    survivors = docs.join(dels, "doc_id", "left_anti")
    want = {
        (r["band"], r["sig"], r["keeper"])
        for r in build_lsh_band_index(survivors).collect()
    }
    assert got == want
    # postings shrank by exactly the deleted docs' band rows
    n_del_rows = post.join(dels, "doc_id").count()
    assert upd_post.count() == post.count() - n_del_rows


def test_delete_then_append_composes(spark, sf_dir, tmp_path):
    """The full index lifecycle: build on base, DELETE a batch, then
    APPEND a delta via apply_exact_dedup_index — the final index
    equals from-scratch over (base - deleted) + delta. Deletion and
    append are independent index maintenance operations and must
    compose in either order of arrival."""
    from gisaid_pipeline_functions_spark.operators.dedup import (
        apply_exact_dedup_index,
        delete_from_exact_dedup_index,
        exact_dedup_postings,
        exact_duplicates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    cut = mx * 4 // 5
    base = docs.filter(F.col("doc_id") <= cut)
    delta = docs.filter(F.col("doc_id") > cut)

    post = exact_dedup_postings(base).localCheckpoint(eager=True)
    index = post.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    dels = (
        base.filter(F.col("doc_id") % 11 == 0)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    del_index, _post2 = delete_from_exact_dedup_index(index, post, dels)
    _drops, final_index = apply_exact_dedup_index(del_index, delta)

    got = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in final_index.collect()
    }
    kept = base.join(dels, "doc_id", "left_anti").unionByName(delta)
    want = {
        (r["fingerprint"], r["keeper_id"], r["n_copies"])
        for r in exact_duplicates(kept, "doc_id", "text").collect()
    }
    assert got == want
