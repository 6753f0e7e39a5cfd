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


def test_one_file_per_bucket_join_is_also_sort_free(spark, sf_dir):
    """The r7 upgrade of sink_bucketed_join_roundtrip, asserted
    standalone: repartition on the bucket key before bucketBy (one file
    per bucket) + the sorted-bucket-scan conf gives a merge join with NO
    Exchange AND no Sort node — the scan streams straight into the
    merge. Without the one-file write OR without the conf, Spark puts
    the Sorts back."""
    import shutil

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("sf_orders", "sf_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.repartition(8, "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("sf_orders")
    )
    (
        li.repartition(8, "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("sf_lineitem")
    )
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "true")
    try:
        joined = (
            spark.table("sf_orders").hint("merge")
            .join(spark.table("sf_lineitem"), "o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(conf, prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Sort [" not in plan  # 'SortMergeJoin [' does not match this


def test_zorder_value_matches_python_reference_and_block_property(spark):
    """Morton codes vs a bit-twiddling Python reference on a full 32x32
    grid, plus the property the pruning query relies on: every aligned
    4^k Z-range is an axis-aligned block (so contiguous Z buckets have
    tight min/max in BOTH dims)."""
    from gisaid_pipeline_functions_spark.operators.layout import zorder_value

    def ref(x, y, bits=5):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), bits=5).alias("z")
        ).collect()
    }
    for (x, y), z in out.items():
        assert z == ref(x, y)
    # block property: z in [b*64, (b+1)*64) <=> an 8x8 aligned block
    from collections import defaultdict

    blocks = defaultdict(list)
    for (x, y), z in out.items():
        blocks[z // 64].append((x, y))
    for b, cells in blocks.items():
        xs = [c[0] for c in cells]
        ys = [c[1] for c in cells]
        assert len(cells) == 64
        assert max(xs) - min(xs) == 7 and min(xs) % 8 == 0
        assert max(ys) - min(ys) == 7 and min(ys) % 8 == 0
