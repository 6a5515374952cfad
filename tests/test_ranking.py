"""Distributed-global-rank operators (operators/ranking.py): guards fail
loudly, and the block-decomposed / top-k-join implementations are
bit-identical to the single-partition window they replace."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
    top_k_ranked,
    uniform_key_global_rank,
)


def _hashed(spark, n=500):
    # uniform 48-bit key from md5, matching the training-order shape
    return spark.range(n).select(
        F.col("id"),
        F.expr(
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
        ).alias("k"),
    )


def test_global_rank_matches_single_partition_window(spark):
    df = _hashed(spark)
    got = uniform_key_global_rank(df, F.col("k"), [F.col("id")], key_bits=48, out="rn")
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("k"), F.col("id"))).cast("long")
    )
    assert got.select("id", "rn").exceptAll(want.select("id", "rn")).count() == 0
    assert want.select("id", "rn").exceptAll(got.select("id", "rn")).count() == 0


def test_global_rank_is_dense_from_one(spark):
    got = uniform_key_global_rank(
        _hashed(spark, 100), F.col("k"), [F.col("id")], key_bits=48, block_bits=4
    )
    rows = got.agg(
        F.min("rn"), F.max("rn"), F.countDistinct("rn"), F.count("*")
    ).first()
    assert tuple(rows) == (1, 100, 100, 100)


def test_global_rank_guards(spark):
    df = _hashed(spark, 10)
    with pytest.raises(ValueError, match="block_bits"):
        uniform_key_global_rank(df, F.col("k"), [], key_bits=8, block_bits=8)
    with pytest.raises(ValueError, match="collide"):
        uniform_key_global_rank(
            df.withColumn("_rank_block", F.lit(1)), F.col("k"), [], key_bits=48
        )
    with pytest.raises(ValueError, match="collide"):  # out-name collision
        uniform_key_global_rank(df, F.col("k"), [], key_bits=48, out="k")


def test_top_k_ranked_matches_window_with_ties(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 9), ("d", 1), ("e", 7)], ["key", "n"]
    )
    got = top_k_ranked(df, [("n", "desc"), ("key", "asc")], 3, out="rk")
    want = (
        df.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("key"))),
        )
        .filter(F.col("rk") <= 3)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_top_k_ranked_guards(spark):
    df = spark.range(3).select(F.col("id"), F.lit(1).alias("n"))
    with pytest.raises(ValueError, match="positive"):
        top_k_ranked(df, [("n", "desc")], 0)
    with pytest.raises(ValueError, match="direction"):
        top_k_ranked(df, [("n", "down")], 2)
    with pytest.raises(ValueError, match="already present"):
        top_k_ranked(df, [("n", "desc")], 2, out="id")


def test_ordered_prefix_sum_matches_single_partition_window(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.range(777).select(
        F.col("id"),
        # non-uniform values incl. negatives and ties
        ((F.col("id") % 37) - 5).cast("decimal(12,2)").alias("v"),
    )
    got = ordered_prefix_sum(df, [("v", "desc"), ("id", "asc")], "v", out="cs")
    w = Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cs", F.sum("v").over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ordered_prefix_sum_guards(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.range(5).select(F.col("id"), F.lit(1).alias("v"))
    with pytest.raises(ValueError, match="directions"):
        ordered_prefix_sum(df, [("v", "down")], "v")
    with pytest.raises(ValueError, match="collide"):
        ordered_prefix_sum(df.withColumn("_ps_pid", F.lit(1)), [("v", "asc")], "v")
    with pytest.raises(ValueError, match="collide"):
        ordered_prefix_sum(df, [("v", "asc")], "v", out="id")


def test_ordered_prefix_sum_property(spark):
    """Property check over adversarial value patterns: all-equal values
    (every row lands in one range partition), alternating signs, and a
    two-value skew — the prefix sum must equal the single-partition
    window on each."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    patterns = {
        "all_equal": F.lit(7).cast("decimal(10,2)"),
        "alternating": (F.when(F.col("id") % 2 == 0, 1).otherwise(-1)).cast("decimal(10,2)"),
        "skewed": (F.when(F.col("id") % 10 == 0, 1000).otherwise(1)).cast("decimal(10,2)"),
    }
    for label, expr in patterns.items():
        df = spark.range(311).select("id", expr.alias("v"))
        got = ordered_prefix_sum(df, [("v", "asc"), ("id", "desc")], "v", out="cs")
        w = Window.orderBy(F.asc("v"), F.desc("id")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = df.withColumn("cs", F.sum("v").over(w))
        assert got.exceptAll(want).count() == 0, label
        assert want.exceptAll(got).count() == 0, label


def test_ordered_prefix_sum_rejects_reserved_out(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.range(5).select(F.col("id"), F.lit(1).alias("v"))
    with pytest.raises(ValueError, match="collides"):
        ordered_prefix_sum(df, [("v", "asc")], "v", out="_ps_local")


def test_ordered_prefix_sum_multi_column_matches_two_passes(spark):
    """A k-column prefix sum (one exchange) must equal k independent
    single-column passes, and both must equal the single-partition
    window — including on ties broken by the order spec."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.range(300).select(
        (F.col("id") % 37).alias("v"),
        F.col("id").alias("tie"),
        (F.col("id") % 7).alias("x"),
        (F.col("id") % 11).alias("y"),
    )
    multi = ordered_prefix_sum(
        df, [("v", "asc"), ("tie", "asc")], ["x", "y"], out=["cx", "cy"]
    )
    w = (
        Window.orderBy(F.col("v").asc(), F.col("tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cx", F.sum("x").over(w)).withColumn(
        "cy", F.sum("y").over(w)
    )
    got = {(r.v, r.tie): (r.cx, r.cy) for r in multi.collect()}
    exp = {(r.v, r.tie): (r.cx, r.cy) for r in want.collect()}
    assert got == exp


def test_ordered_prefix_sum_multi_column_guards(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.range(5).select(F.col("id").alias("v"), F.lit(1).alias("x"))
    with pytest.raises(ValueError, match="value column"):
        ordered_prefix_sum(df, [("v", "asc")], ["x", "x"], out=["a"])
    with pytest.raises(ValueError, match="internals"):
        ordered_prefix_sum(df, [("v", "asc")], "x", out="_ps_evil")
