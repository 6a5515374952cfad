"""Cross-query invariants: algebraic identities that must hold between
independent catalog entries — a second correctness net on top of the
per-query oracles (the reference's own method: reconciliation queries
between layers, ELT.sql:358-470)."""

from __future__ import annotations

import math

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog

from .conftest import SF_ORACLE

CATALOG = get_catalog()


@pytest.fixture(scope="module")
def kpis(spark):
    row = CATALOG["measures_kpi_row"].fn(spark, SF_ORACLE).collect()[0].asDict()
    return row


def test_revenue_share_sums_to_one(spark):
    rows = CATALOG["revenue_share_by_category"].fn(spark, SF_ORACLE).collect()
    total_share = sum(r["revenue_share"] for r in rows)
    assert math.isclose(total_share, 1.0, rel_tol=1e-9)


def test_cumulative_revenue_ends_at_total(spark, kpis):
    rows = CATALOG["measure_cumulative_revenue"].fn(spark, SF_ORACLE).collect()
    last = max(rows, key=lambda r: r["month"])
    assert math.isclose(last["cumulative_revenue"], kpis["total_revenue"], rel_tol=1e-9)


def test_monthly_sums_to_total(spark, kpis):
    rows = CATALOG["measure_monthly_revenue"].fn(spark, SF_ORACLE).collect()
    assert math.isclose(
        sum(r["revenue"] for r in rows), kpis["total_revenue"], rel_tol=1e-9
    )


def test_rolling_3m_bounds_monthly(spark):
    monthly = {
        r["month"]: r["revenue"]
        for r in CATALOG["measure_monthly_revenue"].fn(spark, SF_ORACLE).collect()
    }
    rolling = CATALOG["measure_rolling_3m_revenue"].fn(spark, SF_ORACLE).collect()
    for r in rolling:
        assert r["rolling_3m_revenue"] >= monthly[r["month"]] - 1e-6


def test_arpo_consistent(spark, kpis):
    assert math.isclose(
        kpis["arpo"], kpis["total_revenue"] / kpis["total_orders"], rel_tol=1e-12
    )


def test_cltv_total_matches_kpi_revenue(spark, kpis):
    rows = CATALOG["olap_cltv"].fn(spark, SF_ORACLE).collect()
    assert math.isclose(
        sum(r["lifetime_revenue"] for r in rows), kpis["total_revenue"], rel_tol=1e-9
    )


def test_molap_equals_olap_aggregate(spark):
    """The MOLAP pre-aggregate re-aggregated equals the OLAP verification
    query's grand total (MOLAP.sql:156-177's check, engine-side)."""
    molap = CATALOG["molap_month_country"].fn(spark, SF_ORACLE).collect()
    olap = CATALOG["olap_monthly_country_verification"].fn(spark, SF_ORACLE).collect()
    assert math.isclose(
        sum(r["total_revenue"] for r in molap),
        sum(r["revenue"] for r in olap),
        rel_tol=1e-9,
    )


def test_dedup_exact_partitions_documents(spark):
    groups = CATALOG["dedup_exact_documents"].fn(spark, SF_ORACLE).collect()
    n_docs = sum(r["n_docs"] for r in groups)
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        read_table,
    )

    assert n_docs == read_table(spark, SF_ORACLE, "documents").count()


def test_minhash_lsh_subset_of_exact_jaccard(spark):
    """LSH+verify output must equal the exact-Jaccard pair set (verify
    makes it exact given recall; both run here, not just the oracle)."""
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in CATALOG["dedup_minhash_lsh"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in CATALOG["dedup_ngram_jaccard_pairs"].fn(spark, SF_ORACLE).collect()
    }
    assert lsh == exact


def test_contrastive_negatives_never_self(spark):
    """Every sampled negative must differ from its anchor (the bucket's
    second minimum absorbs self-collisions) and be a real corpus doc."""
    from .conftest import SF_ORACLE
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.sampling import (
        sample_contrastive_negatives,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        read_table,
    )

    rows = sample_contrastive_negatives(spark, SF_ORACLE).collect()
    assert rows, "anchor cohort empty"
    ids = {
        r.doc_id for r in read_table(spark, SF_ORACLE, "documents").select("doc_id").collect()
    }
    for r in rows:
        assert r.negative_id is not None
        assert r.negative_id != r.anchor_id
        assert r.negative_id in ids
