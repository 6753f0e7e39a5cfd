"""Bucketing evidence for the 100 TB story (SCALING.md §Joins): two tables
bucketed + sorted on the join key join WITHOUT a shuffle — the plan the
big metadata⋈clusters join (J1) gets at ingest-bucketed scale."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)  # orphan locations
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    return spark.table("b_orders"), spark.table("b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    orders, li = bucketed
    # the 'merge' hint pins SortMergeJoin — at test scale the dimension
    # would auto-broadcast, which hides exactly what we're demonstrating
    joined = orders.hint("merge").join(li, "o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # co-bucketed + co-sorted: SortMergeJoin with NO Exchange on either side
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed):
    orders, li = bucketed
    bucketed_agg = (
        orders.join(li, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plain_orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    plain_li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain_agg = (
        plain_orders.join(plain_li, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, bucketed_agg.collect())) == sorted(
        map(tuple, plain_agg.collect())
    )
