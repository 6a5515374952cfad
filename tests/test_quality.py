"""Quality-layer tests: audit counts are non-vacuous, JSONL roundtrip
is lossless, compaction actually collapses file counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.layout import scratch_path

from .conftest import SF_ORACLE

CATALOG = get_catalog()


def test_constraint_audit_counts_planted_dirt(spark):
    rows = {r.constraint_name: r.n_violations for r in
            CATALOG["dq_constraint_audit"].fn(spark, SF_ORACLE).collect()}
    # the staging builder plants each dirt class deterministically, so
    # every constraint must catch a nonzero violation count
    assert set(rows) == {
        "blank_invoiceid", "unparseable_date", "bad_quantity",
        "bad_unitprice", "malformed_stockcode",
    }
    assert all(v > 0 for v in rows.values()), rows


def test_jsonl_roundtrip_no_row_loss(spark):
    out = CATALOG["export_jsonl_roundtrip"].fn(spark, SF_ORACLE)
    n = out.count()
    assert n == out.select("doc_id").distinct().count() > 0
    assert out.filter(F.col("text_md5").isNull()).count() == 0


def test_compaction_collapses_file_count(spark):
    CATALOG["layout_compact_roundtrip"].fn(spark, SF_ORACLE).collect()
    frag = spark.read.parquet(scratch_path(SF_ORACLE, "lineitem_fragmented"))
    comp = spark.read.parquet(scratch_path(SF_ORACLE, "lineitem_compacted"))
    n_frag = frag.select(F.input_file_name()).distinct().count()
    n_comp = comp.select(F.input_file_name()).distinct().count()
    assert n_frag == 64
    assert n_comp == 4
    assert frag.count() == comp.count()
