"""Input-validation and predicate-hygiene guards (ADVICE r1 fixes):
misuse must fail loudly with ValueError before any plan is built, and
ivf_topk predicates must survive id-name substrings in other
identifiers/literals (no string surgery on predicate text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    dedup as D,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    measures as M,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    similarity as S,
)


def _sigs(spark, n_hashes):
    cols = [F.lit(i).alias(f"m{i}") for i in range(n_hashes)]
    return spark.range(4).select(F.col("id").alias("doc"), *cols)


def test_lsh_rejects_bands_exceeding_hashes(spark):
    with pytest.raises(ValueError, match="bands"):
        D.lsh_candidate_pairs(_sigs(spark, 8), bands=16)


def test_lsh_rejects_non_divisor_bands(spark):
    with pytest.raises(ValueError, match="bands"):
        D.lsh_candidate_pairs(_sigs(spark, 32), bands=5)


def test_lsh_accepts_exact_banding(spark):
    assert D.lsh_candidate_pairs(_sigs(spark, 8), bands=4).count() >= 0


@pytest.fixture()
def fact(spark):
    return spark.createDataFrame(
        [("i1", 10, 5.0, 100.0), ("i2", 20, 2.0, 40.0)],
        "invoiceid string, customer_key int, quantity double, totalamount double",
    )


def test_measures_unknown_measure_is_value_error(fact):
    with pytest.raises(ValueError, match="unknown measures"):
        M.evaluate(fact, measures=["not_a_measure"])


def test_measures_arpc_alone_is_value_error(fact):
    dim = fact.sparkSession.createDataFrame([("c1",)], "customerid string")
    with pytest.raises(ValueError, match="total_revenue"):
        M.evaluate(fact, measures=["arpc"], dim_customer=dim)


def test_measures_arpc_without_dim_is_value_error(fact):
    with pytest.raises(ValueError, match="dim_customer"):
        M.evaluate(fact, measures=["arpc", "total_revenue"])


def test_measures_arpc_with_revenue_works(fact):
    dim = fact.sparkSession.createDataFrame(
        [("c1",), ("c2",)], "customerid string"
    )
    row = M.evaluate(fact, measures=["total_revenue", "arpc"], dim_customer=dim).collect()[0]
    assert row["arpc"] == row["total_revenue"] / 2


def test_simhash_block_table_rejects_width_mismatch(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")], "doc_id int, text string"
    )
    sim32 = D.simhash(docs, "doc_id", "text", bits=32)
    with pytest.raises(ValueError, match="bits=32"):
        D.simhash_block_table(sim32, bits=64)
    with pytest.raises(ValueError, match="bits=32"):
        D.simhash_near_pairs(sim32, bits=64)
    # matching widths pass through
    assert D.simhash_block_table(sim32, bits=32).count() > 0


def test_srp_signatures_rejects_overflowing_nbits(spark):
    emb = spark.createDataFrame([(1, [1.0, -1.0])], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="nbits"):
        S.srp_signatures(emb, nbits=64, dim=2)
    with pytest.raises(ValueError, match="nbits"):
        S.srp_signatures(emb, nbits=0, dim=2)
    assert S.srp_signatures(emb, nbits=63, dim=2).count() == 1


def test_srp_signatures_fails_loudly_on_width_mismatch(spark):
    # a vector narrower than dim used to null-pad the dot product and
    # silently resolve every affected bit to 0 — now the job raises
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    emb = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5]), (2, [1.0, -1.0])],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="embedding width"):
        S.srp_signatures(emb, nbits=8, dim=3).collect()
    # uniform widths pass through untouched
    ok = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5]), (2, [0.0, 2.0, -1.0])],
        "vec_id int, embedding array<double>",
    )
    assert S.srp_signatures(ok, nbits=8, dim=3).count() == 2


def test_asof_join_rejects_reserved_column_names(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        scd as SCD,
    )

    fact = spark.createDataFrame([(1, 10, "x")], "k int, t int, _ver string")
    dim = spark.createDataFrame([(1, 5, 9.0)], "k int, vt int, price double")
    with pytest.raises(ValueError, match="_ver"):
        SCD.asof_join(fact, dim, "k", "t", "vt", ["price"])
    dim_bad = spark.createDataFrame([(1, 5, 9.0)], "k int, _t int, price double")
    fact_ok = spark.createDataFrame([(1, 10)], "k int, t int")
    with pytest.raises(ValueError, match="_t"):
        SCD.asof_join(fact_ok, dim_bad, "k", "t", "_t", ["price"])


def test_asof_join_duplicate_timestamp_versions_resolve_deterministically(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        scd as SCD,
    )

    fact = spark.createDataFrame([(1, 10), (1, 4)], "k int, t int")
    # two versions of key 1 effective at the same instant: struct-wise
    # max (price 9.0) must win on every run; facts before the first
    # version keep NULL
    dim = spark.createDataFrame(
        [(1, 5, 2.0), (1, 5, 9.0)], "k int, vt int, price double"
    )
    for _ in range(3):
        got = {r["t"]: r["price"] for r in SCD.asof_join(
            fact, dim, "k", "t", "vt", ["price"]
        ).collect()}
        assert got == {10: 9.0, 4: None}


def test_ivf_predicate_survives_idname_in_literal_and_identifier(spark):
    # 'vec_id' appears both as a literal value in the label column and as
    # a prefix of another column name — the old substring replace turned
    # "label <> 'vec_id'" into "label <> 'vid'" silently
    rows = [(i, f"v{i}", [1.0, float(i % 3)], "vec_id" if i == 1 else "ok") for i in range(6)]
    emb = spark.createDataFrame(
        rows, "vec_id int, vec_id_tag string, embedding array<double>, label string"
    )
    cents = emb.filter("vec_id % 3 = 0")
    pred = "vec_id < 3 AND label <> 'vec_id'"
    for nprobe in (1, 2):
        got = S.ivf_topk(emb, cents, pred, k=2, nprobe=nprobe)
        queries = {r["query_id"] for r in got.collect()}
        assert queries <= {0, 2}  # vec_id 1 excluded by the label literal
        assert 0 in queries
