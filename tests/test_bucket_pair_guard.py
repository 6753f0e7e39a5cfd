"""The r18 hot-bucket guard on the bucket pair-generators
(operators/dedup.py:bucket_pair_rows): buckets larger than ``cap`` are
positionally chunked before pair generation. These tests pin the guard's
value identity — the pair multiset must equal the ungated i<j generator
for every bucket size straddling the chunk boundaries — and that the
guard path actually engages (hot branch non-empty) when a bucket
exceeds the cap.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.dedup import bucket_pair_rows


def _buckets_df(spark, buckets: dict[str, list[int]]):
    rows = [(k, sorted(v)) for k, v in buckets.items()]
    return spark.createDataFrame(rows, "k string, ids array<bigint>")


def _expected(buckets: dict[str, list[int]]):
    out = []
    for v in buckets.values():
        out.extend(combinations(sorted(v), 2))
    return sorted(out)


def test_pair_identity_across_chunk_boundaries(spark):
    # sizes 2..10 with cap=3: exercises 1-chunk (<=3), exact-boundary
    # (3, 6, 9), boundary+1 (4, 7, 10) and mid-chunk sizes, several
    # buckets at once (the union must keep buckets separate)
    buckets = {
        f"b{sz}": list(range(sz * 100, sz * 100 + sz)) for sz in range(2, 11)
    }
    df = _buckets_df(spark, buckets)
    got = sorted(
        (r.a, r.b)
        for r in bucket_pair_rows(df, "ids", "a", "b", cap=3).collect()
    )
    assert got == _expected(buckets)


def test_hot_branch_engages_and_matches(spark):
    # one genuinely hot bucket (1000 members, cap=64 -> 16 chunks):
    # n*(n-1)/2 pairs, none duplicated, none missing
    buckets = {"hot": list(range(1000)), "cold": [1, 2, 3]}
    df = _buckets_df(spark, buckets)
    pairs = bucket_pair_rows(df, "ids", "a", "b", cap=64)
    got = sorted((r.a, r.b) for r in pairs.collect())
    assert got == _expected(buckets)
    # the hot branch produced rows (i.e. the guard engaged, this wasn't
    # all the normal path): the normal branch alone would emit only the
    # cold bucket's 3 pairs for a cap this small
    normal_only = sorted(
        (r.a, r.b)
        for r in bucket_pair_rows(
            df.filter(F.size("ids") <= 64), "ids", "a", "b", cap=64
        ).collect()
    )
    assert normal_only == _expected({"cold": [1, 2, 3]})


def test_struct_elements(spark):
    # the PPJoin site pairs structs, not scalars — same identity
    rows = [
        ("t", [(i, i * 10, i % 3) for i in range(7)]),
        ("u", [(i, 5, 0) for i in range(4)]),
    ]
    df = spark.createDataFrame(
        rows, "k string, mem array<struct<id:bigint,sz:bigint,pos:bigint>>"
    ).select("k", F.array_sort("mem").alias("mem"))
    got = sorted(
        ((r.a.id, r.a.sz, r.a.pos), (r.b.id, r.b.sz, r.b.pos))
        for r in bucket_pair_rows(df, "mem", "a", "b", cap=2).collect()
    )
    exp = []
    for _, mem in rows:
        exp.extend(combinations(sorted(mem), 2))
    assert got == sorted(exp)
