"""Targeted invariants for the round-5 text-mining / semantic-dedup
operators (the full value-level check vs DuckDB lives in the oracle
gate — these pin properties the gate can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    similarity as S,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.text_mining import (
    bm25_topk,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    read_table,
)

from .conftest import SF_SMOKE

CATALOG = get_catalog()


def test_bm25_scores_positive_and_k_bounded(spark):
    rows = CATALOG["bm25_topk_search"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    assert all(r.score > 0 for r in rows)


def test_bm25_unknown_term_empty(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    assert bm25_topk(docs, terms=("zzzznotaword",)).count() == 0


def test_bm25_more_occurrences_rank_higher(spark):
    # two synthetic docs, same length, one with double the term count —
    # tf monotonicity of the BM25 saturation curve
    docs = spark.createDataFrame(
        [
            (1, "spark spark filler filler filler filler"),
            (2, "spark filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in bm25_topk(docs, terms=("spark",)).collect()}
    assert got[1] > got[2] > 0


def test_bpe_pairs_are_bigrams(spark):
    rows = CATALOG["bpe_pair_merge_step"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(len(r.pair) == 2 for r in rows)
    # counts sorted non-increasing under the deterministic tiebreak
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_semdedup_min_id_per_cluster_always_kept(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    flags = S.semdedup_keep(emb, emb.filter("vec_id % 50 = 0"), threshold=0.4)
    per_cluster = flags.groupBy("centroid_id").agg(
        F.min("vec_id").alias("min_id"),
        F.min(F.when(F.col("keep"), F.col("vec_id"))).alias("min_kept"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.count("*").alias("n"),
    )
    for r in per_cluster.collect():
        # the smallest id has no smaller near-dup, so it always survives,
        # and every non-empty cluster keeps at least one vector
        assert r.min_kept == r.min_id
        assert 1 <= r.n_kept <= r.n


def test_semdedup_drop_has_lower_id_witness(spark):
    # every dropped vector has a same-cluster lower-id vector with
    # cosine >= threshold (the rule, re-checked pairwise)
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.functions.vectors import (
        s_cosine,
        s_to_double,
    )

    emb = read_table(spark, SF_SMOKE, "embeddings")
    flags = S.semdedup_keep(emb, emb.filter("vec_id % 50 = 0"), threshold=0.4)
    v = emb.select("vec_id", F.expr(s_to_double("embedding")).alias("v"))
    dropped = flags.filter(~F.col("keep")).join(v, "vec_id").select(
        F.col("vec_id").alias("id_b"), F.col("centroid_id"), F.col("v").alias("vb")
    )
    others = flags.join(v, "vec_id").select(
        F.col("vec_id").alias("id_a"), F.col("centroid_id"), F.col("v").alias("va")
    )
    witnessed = (
        dropped.join(others, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.expr(s_cosine("va", "vb")) >= 0.4)
        .select("id_b")
        .distinct()
    )
    assert witnessed.count() == dropped.count()


def test_arrow_gemm_topk_matches_jvm_fold(spark):
    """The BLAS/Arrow brute-force variant must agree with the JVM fold
    on ids and ranks exactly, and on scores to float-summation noise."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter("vec_id < 10")
    jvm = {(r.query_id, r.rank): r for r in S.brute_force_topk(emb, q, k=5).collect()}
    arw = {(r.query_id, r.rank): r for r in S.brute_force_topk_arrow(emb, q, k=5).collect()}
    assert jvm.keys() == arw.keys() and jvm
    for key, a in arw.items():
        j = jvm[key]
        assert a.neighbor_id == j.neighbor_id, key
        assert abs(a.score - j.score) < 1e-9, key


def test_kmeans_objective_monotone_and_sizes_conserved(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    prev = None
    for iters in (1, 2, 3):
        fit = S.kmeans_fit(emb, k=8, iters=iters)
        rows = fit.collect()
        assert sum(r.n_members for r in rows) == n  # every vector assigned
        obj = S.kmeans_objective(emb, fit.select("centroid_id", "cv"))
        if prev is not None:
            # Lloyd's objective (mean best-cosine) never decreases;
            # allow the 1e-6 centroid-rounding wobble
            assert obj >= prev - 1e-5, (iters, prev, obj)
        prev = obj


def test_kmeans_deterministic_rerun(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = sorted((r.centroid_id, r.n_members) for r in S.kmeans_fit(emb, k=8, iters=2).collect())
    b = sorted((r.centroid_id, r.n_members) for r in S.kmeans_fit(emb, k=8, iters=2).collect())
    assert a == b and len(a) == 8


def test_kmeans_empty_cluster_conserves_k(spark):
    """Engineered empty cluster (round-5 judge item): seeds 1 and 2 are
    the SAME vector, so every member cosine-ties and the smaller
    centroid_id wins — centroid 2's member set is empty from round 1 on.
    The carry-forward rule must keep it (previous vector, n_members=0)
    instead of silently shrinking the trained k."""
    # every centroid-1 member is exactly [1,0], so its mean stays [1,0]
    # == centroid 2's carried vector and the min-id tiebreak keeps
    # centroid 2 empty at EVERY round (not just round 1)
    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]),
        (4, [1.0, 0.0]), (5, [0.0, 1.0]), (6, [1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for iters in (1, 3):
        fit = {r.centroid_id: r for r in S.kmeans_fit(emb, k=3, iters=iters).collect()}
        assert sorted(fit) == [1, 2, 3], f"k not conserved at iters={iters}"
        assert fit[2].n_members == 0
        # the empty centroid carries its seed vector forward verbatim
        assert list(fit[2].cv) == [1.0, 0.0]
        assert sum(r.n_members for r in fit.values()) == len(rows)
