"""Layout-layer tests: beyond the oracle value checks, assert the PLAN
properties that make each layout pay off at scale — partition pruning,
parquet filter pushdown, and exchange-free bucketed joins."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import layout as L
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    read_table,
)

from .conftest import SF_ORACLE, SF_SMOKE


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def pruned_read(spark):
    path = L.scratch_path(SF_SMOKE, "orders_by_year")
    orders = read_table(spark, SF_SMOKE, "orders").withColumn("o_year", F.year("o_orderdate"))
    L.write_partitioned(orders, path, ["o_year"], sort_cols=["o_orderdate"])
    return spark.read.parquet(path).filter(F.col("o_year") == 1995)


def test_partition_pruning_in_plan(pruned_read):
    plan = explain_str(pruned_read.groupBy().count())
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters", 1)[1][:300]


def test_partition_prune_reads_single_partition(pruned_read, spark):
    # the pruned scan must touch only the 1995 directory
    files = [r[0] for r in pruned_read.select(F.input_file_name()).distinct().collect()]
    assert files and all("o_year=1995" in f for f in files)


def test_list_partition_pruning_in_plan(spark):
    """LIST-partitioned layout (by o_orderpriority): the catalog entry's
    scan prunes at the file index — PartitionFilters carries the priority
    equality, and only the one partition directory is touched."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import (
        get_catalog,
    )

    df = get_catalog()["layout_list_partition_pruned"].fn(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters", 1)[1][:300]
    path = L.scratch_path(SF_SMOKE, "orders_by_priority")
    pruned = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files and all("o_orderpriority=1-URGENT" in f for f in files)


def test_dynamic_partition_pruning_in_plan(spark):
    """The DPP entry's fact scan must carry a dynamicpruning expression
    in PartitionFilters — runtime pruning fed by the filtered dim."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import (
        get_catalog,
    )

    df = get_catalog()["layout_dynamic_partition_pruned_join"].fn(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan:\n{plan}"


def test_rowgroup_pushdown_in_plan(spark):
    path = L.scratch_path(SF_SMOKE, "lineitem_by_shipdate")
    L.write_range_sorted(read_table(spark, SF_SMOKE, "lineitem"), path, ["l_shipdate"])
    back = spark.read.parquet(path).filter(
        F.col("l_shipdate").between("1995-01-01", "1995-03-31")
    )
    plan = explain_str(back.groupBy().count())
    pushed = plan.split("PushedFilters", 1)
    assert len(pushed) == 2, f"no PushedFilters in plan:\n{plan}"
    assert "GreaterThanOrEqual(l_shipdate" in pushed[1][:400]
    # range-sort means the matching files form a contiguous subset
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    all_files = {
        r[0]
        for r in spark.read.parquet(path).select(F.input_file_name()).distinct().collect()
    }
    assert len(files) < len(all_files)


def test_bucketed_join_has_no_exchange(spark):
    ot, ct = "t_orders_b", "t_customer_b"
    L.write_bucketed(
        read_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice"),
        ot, L.scratch_path(SF_SMOKE, "t_orders_bucketed"), "o_custkey",
    )
    L.write_bucketed(
        read_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment"),
        ct, L.scratch_path(SF_SMOKE, "t_customer_bucketed"), "c_custkey",
    )
    # at test scale the planner would broadcast (rightly); force the
    # large-large strategy bucketing exists for and assert no shuffle
    joined = spark.table(ot).hint("merge").join(
        spark.table(ct).hint("merge"), F.col("o_custkey") == F.col("c_custkey")
    )
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert joined.count() == spark.table(ot).count()


def test_mv_refresh_roundtrip_equals_recompute(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.insights import (
        mv_monthly_category_sales,
    )

    path = L.refresh_gold_table(spark, SF_SMOKE)
    persisted = spark.read.parquet(path)
    fresh = mv_monthly_category_sales(spark, SF_SMOKE)
    assert sorted(persisted.columns) == sorted(fresh.columns)
    assert persisted.count() == fresh.count()
    assert persisted.exceptAll(fresh.select(*persisted.columns)).count() == 0


def test_salted_join_equals_plain_join(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.skew import (
        salted_join,
    )

    orders = read_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("k"), "o_totalprice"
    )
    cust = read_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    salted = salted_join(orders, cust, "k", n_salts=4)
    plain = orders.join(cust, "k")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain.select(*salted.columns)).count() == 0


def test_ivf_nprobe_recall_monotone(spark):
    """nprobe=2 recall vs brute force must be >= nprobe=1 recall."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = read_table(spark, SF_SMOKE, "embeddings")
    centroids = emb.filter("vec_id % 17 = 0")
    queries = emb.filter("vec_id < 10")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=3).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, centroids, "vec_id < 10", k=3, nprobe=nprobe).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert 0 <= r1 <= r2 <= 1


def test_srp_blocking_is_lossless_vs_bruteforce(spark):
    """SRP pigeonhole blocking must return EXACTLY the brute-force
    (hamming<=H AND cos>=τ) pair set."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.similarity import (
        srp_near_pairs,
        srp_signatures,
    )

    from .conftest import SF_ORACLE

    emb = read_table(spark, SF_ORACLE, "embeddings")
    sigs = {r.doc: r.srp_sig for r in srp_signatures(emb).collect()}
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in srp_near_pairs(emb, max_hamming=8, threshold=0.4).collect()
    }
    # blocked candidates must include every hamming<=8 pair of the final set
    for (a, b, h) in got:
        assert bin(sigs[a] ^ sigs[b]).count("1") == h <= 8
    # and equal the brute-force screen intersected with the cosine verify
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.functions.vectors import (
        s_cosine,
        s_to_double,
    )

    v = emb.select(F.col("vec_id").alias("vid"), F.expr(s_to_double("embedding")).alias("v"))
    a = v.withColumnsRenamed({"vid": "id_a", "v": "va"})
    b = v.withColumnsRenamed({"vid": "id_b", "v": "vb"})
    exact = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr(s_cosine("va", "vb")).alias("score"))
        .filter(F.col("score") >= 0.4)
        .collect()
        if bin(sigs[r.id_a] ^ sigs[r.id_b]).count("1") <= 8
    }
    assert {(x, y) for (x, y, _) in got} == exact


def test_zvalue_interleaves_bits(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.layout import zvalue

    def py_z(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(rows, "a INT, b INT").select(
        "a", "b", zvalue("a", "b").alias("z")
    )
    for r in df.collect():
        assert r.z == py_z(r.a, r.b), (r.a, r.b)


def test_zorder_layout_clusters_both_dims(spark):
    """Row-group stats payoff: within each z-sorted file, BOTH dimension
    ranges are much narrower than the global range (a linear sort only
    narrows its leading column)."""
    import pyspark.sql.functions as F
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.layout import scratch_path

    get_catalog()["layout_zorder_skip"].fn(spark, SF_ORACLE).collect()  # ensures layout
    files = spark.read.parquet(scratch_path(SF_ORACLE, "orders_zorder")).withColumn(
        "f", F.input_file_name()
    )
    stats = files.groupBy("f").agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("day_span"),
    ).collect()
    glob = files.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dd"),
    ).first()
    assert len(stats) >= 4
    avg_ck = sum(r.ck_span for r in stats) / len(stats)
    avg_dd = sum(r.day_span for r in stats) / len(stats)
    # each z-run should cover well under the full span of each dimension
    assert avg_ck < 0.75 * glob.ck
    assert avg_dd < 0.75 * glob.dd


def test_zvalue_n_matches_2d_zvalue(spark):
    """zvalue_n with two columns must equal zvalue bit-for-bit (same
    layout convention), and the 3-D interleave puts column j's bit i
    at position 3*i + (2-j)."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.zorder import (
        zvalue,
        zvalue_n,
    )

    df = spark.createDataFrame(
        [(a, b, c) for a in (0, 1, 5, 100) for b in (0, 3, 77) for c in (0, 2)],
        "a long, b long, c long",
    )
    mism = df.select(
        (zvalue("a", "b", 16) != zvalue_n(["a", "b"], 16)).alias("x")
    ).filter("x").count()
    assert mism == 0
    rows = df.select("a", "b", "c", zvalue_n(["a", "b", "c"], 8).alias("z")).collect()
    for r in rows:
        want = 0
        for i in range(8):
            want |= ((r["a"] >> i) & 1) << (3 * i + 2)
            want |= ((r["b"] >> i) & 1) << (3 * i + 1)
            want |= ((r["c"] >> i) & 1) << (3 * i)
        assert r["z"] == want


def test_zvalue_n_bit_budget_guard(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.zorder import (
        zvalue_n,
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="int64"):
        zvalue_n(["a", "b", "c"], 22)  # 66 bits
    with _pt.raises(ValueError, match="at least 2"):
        zvalue_n(["a"])


def test_table_format_zorder_three_dims_prune(spark, tmp_path):
    """compact(zorder_by=3 cols): a range where on ANY of the three
    dimensions prunes files, and pruned reads stay supersets."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        table_format as tf,
    )

    root = str(tmp_path / "z3")
    cube = spark.range(0, 16 * 16 * 16).select(
        (F.col("id") % 16).cast("long").alias("x"),
        ((F.col("id") / 16).cast("long") % 16).alias("y"),
        (F.col("id") / 256).cast("long").alias("z"),
    )
    tf.create_table(spark, root, cube, files=1)
    tf.compact(spark, root, files=8, zorder_by=("x", "y", "z"))
    for col in ("x", "y", "z"):
        sel, total = tf.snapshot_files(root, None, {col: (0, 3)})
        assert total == 8 and len(sel) < total, col
        got = tf.read_version(spark, root, where={col: (0, 3)}).filter(
            F.col(col) <= 3
        ).count()
        assert got == 4 * 16 * 16
