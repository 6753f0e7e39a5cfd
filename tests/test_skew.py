"""Salted join must be result-identical to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.skew import key_skew_profile, salted_join
from gisaid_pipeline_functions_spark.sources.tables import load_table


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", salt_buckets=4)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_profile_shares_sum_below_one(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    prof = key_skew_profile(li, "l_returnflag", top=3).collect()
    assert len(prof) == 3
    assert all(0 < r["share"] <= 1 for r in prof)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    # the query now carries the 5% bound as its own output contract
    # (within_5pct must be uniformly TRUE for the oracle hash to match)
    from gisaid_pipeline_functions_spark import registry

    rows = registry.queries()["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows and all(r["within_5pct"] for r in rows)
    assert all(r["exact_parts"] > 0 for r in rows)
