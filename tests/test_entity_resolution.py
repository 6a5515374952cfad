"""Entity-resolution properties (plans/entity_resolution.py) beyond the
oracle hash match: the blocking-recall claim, survivorship cardinality,
and determinism under arbitrary input partitioning.

The oracle gate proves both engines derive the same answer; these tests
prove the CLAIMS the module's docstring makes about that answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.entity_resolution import (
    _crm_extract,
    _linked,
    er_golden_record,
    er_linkage_quality,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    read_table,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_blocking_recall_is_total(spark):
    """Every NON-poison CRM record's true customer must be matched, and
    matched at the modeled typo distance (<= 2) — the docstring's
    'recall is 1.0 by construction' claim. Poison (reversed-name)
    records must all be unmatched: their digit payload lands in a far
    band AND the name similarity is below threshold."""
    lk = _linked(spark, SF_SMOKE).collect()
    for r in lk:
        if r.true_key % 97 == 0:
            assert not r.matched, f"poison crm_id={r.crm_id} matched {r.matched_customer_key}"
        else:
            assert r.matched, f"clean crm_id={r.crm_id} unmatched"
            assert r.match_distance <= 2, (
                f"crm_id={r.crm_id} matched at distance {r.match_distance}"
            )


def test_wrong_matches_are_exactly_the_documented_class(spark):
    """A wrong match may ONLY be the documented residual: distance 0
    (an exact-name collision) — never a worse-name candidate beating
    the truth."""
    lk = _linked(spark, SF_SMOKE).collect()
    for r in lk:
        if r.matched and r.matched_customer_key != r.true_key:
            assert r.match_distance == 0, (
                f"crm_id={r.crm_id}: wrong match at distance {r.match_distance}"
            )


def test_quality_report_is_consistent(spark):
    q = er_linkage_quality(spark, SF_SMOKE).collect()[0]
    assert q.n_crm == q.n_matched + q.n_unmatched_poison + q.n_missed
    assert q.n_matched == q.n_correct + q.n_wrong
    assert q.n_missed == 0  # blocking recall
    crm_n = _crm_extract(spark, SF_SMOKE).count()
    assert q.n_crm == crm_n


def test_golden_record_cardinality_and_provenance(spark):
    """Survivorship keeps EXACTLY one row per DW customer; crm-enriched
    rows carry the CRM balance, dw-only rows the warehouse one."""
    g = er_golden_record(spark, SF_SMOKE)
    n_cust = read_table(spark, SF_SMOKE, "customer").count()
    assert g.count() == n_cust
    assert g.select("customer_key").distinct().count() == n_cust
    bad = g.filter(
        ((F.col("provenance") == "dw+crm") & F.col("crm_id").isNull())
        | ((F.col("provenance") == "dw") & F.col("crm_id").isNotNull())
    ).count()
    assert bad == 0


def test_linkage_deterministic_under_repartition(spark):
    """The composite-rank tie-break makes the best match independent of
    candidate arrival order: same answer from 1 and 16 partitions."""
    base = {
        (r.crm_id, r.matched_customer_key)
        for r in _linked(spark, SF_SMOKE).collect()
    }
    sc_before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        again = {
            (r.crm_id, r.matched_customer_key)
            for r in _linked(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", sc_before)
    assert base == again


def test_blocking_union_strictly_dominates(spark):
    """r8: each blocking pass alone misses a modeled typo class (high-
    digit corruption escapes the band; low-digit transposition changes
    the suffix) while their union reaches EVERY non-poison truth — the
    per-pass recall claim the quality entry reports, asserted as strict
    inequalities."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import (
        get_catalog,
    )

    row = get_catalog()["er_linkage_quality"].fn(spark, SF_ORACLE).collect()[0]
    assert row.n_truth_reach_union == row.n_nonpoison
    assert row.n_truth_reach_band < row.n_nonpoison
    assert row.n_truth_reach_suffix < row.n_nonpoison
    assert row.n_missed == 0, "end-to-end recall must be 1.0 on non-poison"
