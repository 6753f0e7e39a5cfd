"""JL random-projection ANN: projection parity with a Python reference
and retrieval of unambiguous nearest neighbors (the oracle proves
cross-engine parity; these prove the math and the recall behavior)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from gisaid_pipeline_functions_spark.operators.similarity import (
    jl_projection_matrix,
    random_projection,
    random_projection_topk,
)


def test_projection_matches_python_reference(spark):
    R = jl_projection_matrix(64, 16)
    vec = [float(i % 7) - 3.0 for i in range(64)]
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=vec)], "vec_id long, embedding array<double>"
    )
    [row] = random_projection(df).collect()
    for j in range(16):
        expected = 0.0
        for i in range(64):
            expected += vec[i] * R[j][i]
        assert abs(row["p"][j] - round(expected, 6)) < 1e-9, j


def test_matrix_is_deterministic_and_balanced(spark):
    a = jl_projection_matrix(64, 16)
    b = jl_projection_matrix(64, 16)
    assert a == b
    flat = [x for row in a for x in row]
    assert set(flat) == {-1, 1}
    # md5 nibbles are uniform: the sign balance can't be degenerate
    assert 0.3 < sum(1 for x in flat if x > 0) / len(flat) < 0.7


def test_topk_recovers_clustered_neighbors(spark):
    # three well-separated clusters of near-identical vectors: the
    # projected space preserves the separation (JL), so the shortlist
    # always contains the true cluster-mates and the exact rerank
    # orders them correctly
    def base_vec(seed: int) -> list[float]:
        h = hashlib.md5(f"cluster{seed}".encode()).digest() * 4
        return [float(b) for b in h]

    rows = []
    for c in range(3):
        bv = base_vec(c)
        for m in range(4):
            v = list(bv)
            v[m] += 0.5  # tiny within-cluster jitter
            rows.append(Row(vec_id=c * 4 + m, embedding=v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = random_projection_topk(df, df.filter("vec_id IN (0, 4, 8)"), k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    assert got[0] == {1, 2, 3}
    assert got[4] == {5, 6, 7}
    assert got[8] == {9, 10, 11}
