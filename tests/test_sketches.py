"""Count-min sketch properties the DuckDB oracle can't express:
mergeability (the reason the sketch exists at 100 TB) and the
never-underestimate guarantee over every key, not just the top-20."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.sketches import (
    cms_point_estimates,
    cms_sketch,
)


def _keys(spark, ks):
    return spark.createDataFrame([Row(key=k) for k in ks])


class TestCountMin:
    def test_merge_equals_whole(self, spark):
        # cell-wise sum of two shard sketches == sketch of the union —
        # the partial-aggregation / day-to-month rollup safety property
        a = ["x"] * 5 + ["y"] * 3 + ["z"]
        b = ["x"] * 2 + ["w"] * 4
        sk_a = cms_sketch(_keys(spark, a), depth=2, width=8)
        sk_b = cms_sketch(_keys(spark, b), depth=2, width=8)
        merged = (
            sk_a.unionByName(sk_b)
            .groupBy("r", "c")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = cms_sketch(_keys(spark, a + b), depth=2, width=8)
        m = {(r["r"], r["c"]): r["cnt"] for r in merged.collect()}
        w = {(r["r"], r["c"]): r["cnt"] for r in whole.collect()}
        assert m == w

    def test_never_underestimates_every_key(self, spark):
        import collections

        keys = [f"k{i % 7}" for i in range(50)] + ["rare"]
        exact = collections.Counter(keys)
        sk = cms_sketch(_keys(spark, keys), depth=3, width=4)  # tiny → collisions
        est = {
            r["key"]: r["cms_est"]
            for r in cms_point_estimates(
                sk, _keys(spark, list(exact)), depth=3, width=4
            ).collect()
        }
        assert set(est) == set(exact)
        for k, n in exact.items():
            assert est[k] >= n, (k, est[k], n)

    def test_absent_key_estimates_zero_or_collision(self, spark):
        # a key never inserted probes untouched (zero) cells — the
        # estimate must be 0 unless ALL its cells collide with real keys
        sk = cms_sketch(_keys(spark, ["a", "b", "c"]), depth=4, width=64)
        est = {
            r["key"]: r["cms_est"]
            for r in cms_point_estimates(
                sk, _keys(spark, ["zzz-not-inserted"]), depth=4, width=64
            ).collect()
        }
        assert est["zzz-not-inserted"] == 0

    def test_grid_is_constant_size(self, spark):
        sk = cms_sketch(_keys(spark, [f"k{i}" for i in range(200)]), depth=4, width=16)
        rows = sk.collect()
        assert len(rows) <= 4 * 16
        assert {r["r"] for r in rows} == {0, 1, 2, 3}
        assert all(0 <= r["c"] < 16 for r in rows)


class TestBloom:
    def test_no_false_negatives_and_real_selectivity(self, spark):
        from gisaid_pipeline_functions_spark.operators.sketches import (
            bloom_build,
            bloom_might_contain,
        )

        members = _keys(spark, [f"m{i}" for i in range(300)])
        probe = _keys(
            spark, [f"m{i}" for i in range(300)] + [f"x{i}" for i in range(1000)]
        )
        bloom = bloom_build(members, n_bits=4096, n_hashes=3)
        passed = {
            r["key"] for r in bloom_might_contain(probe, "key", bloom).collect()
        }
        # every member survives (a false negative silently corrupts joins)
        assert all(f"m{i}" in passed for i in range(300))
        # and the filter actually filters: FPR ~0.8% expected at this
        # sizing, so well under 10% of the 1000 non-members leak through
        leaked = sum(1 for k in passed if k.startswith("x"))
        assert leaked < 100, leaked

    def test_shard_merge_is_elementwise_or(self, spark):
        from gisaid_pipeline_functions_spark.operators.sketches import bloom_build

        a = _keys(spark, [f"a{i}" for i in range(50)])
        b = _keys(spark, [f"b{i}" for i in range(50)])
        both = _keys(spark, [f"a{i}" for i in range(50)] + [f"b{i}" for i in range(50)])
        wa = bloom_build(a, n_bits=512).collect()[0]["bloom"]
        wb = bloom_build(b, n_bits=512).collect()[0]["bloom"]
        ww = bloom_build(both, n_bits=512).collect()[0]["bloom"]
        assert [x | y for x, y in zip(wa, wb)] == list(ww)


class TestKmv:
    def test_identical_sets(self, spark):
        from gisaid_pipeline_functions_spark.operators.sketches import (
            kmv_set_estimates,
        )

        df = spark.range(0, 200).select(F.col("id").alias("k"))
        row = kmv_set_estimates(df, df, "k", k=32).collect()[0]
        assert row.n_a == row.n_b == row.n_union == row.n_both == 32
        assert row.jaccard == 1.0
        assert row.est_intersection == row.est_union == row.est_a

    def test_disjoint_small_sets_exact(self, spark):
        from gisaid_pipeline_functions_spark.operators.sketches import (
            kmv_set_estimates,
        )

        a = spark.range(0, 10).select(F.col("id").alias("k"))
        b = spark.range(100, 110).select(F.col("id").alias("k"))
        row = kmv_set_estimates(a, b, "k", k=64).collect()[0]
        # both sketches undersized → exact mode: estimates are the
        # sample sizes; disjoint → zero overlap
        assert row.n_a == 10 and row.est_a == 10.0
        assert row.n_b == 10 and row.est_b == 10.0
        assert row.n_union == 20 and row.est_union == 20.0
        assert row.n_both == 0 and row.jaccard == 0.0
        assert row.est_intersection == 0.0

    def test_estimate_accuracy_bound(self, spark):
        from gisaid_pipeline_functions_spark.operators.sketches import (
            kmv_sketch,
            kmv_set_estimates,
        )

        # 2000 distinct keys, k=128: expected relative error ~1/sqrt(k-1)
        # ≈ 9%; assert a generous 3-sigma band — deterministic (md5), so
        # this can't flake
        df = spark.range(0, 2000).select(F.col("id").alias("k"))
        assert kmv_sketch(df, "k", k=128).count() == 128
        row = kmv_set_estimates(df, df, "k", k=128).collect()[0]
        assert abs(row.est_a - 2000) / 2000 < 0.27
