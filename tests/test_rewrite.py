"""Aggregate-rewrite router tests (plans/rewrite.py): the routed plan
must (a) return exactly the unrewritten answer and (b) actually read the
gold cube instead of the fact star."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import rewrite as R

from .conftest import SF_ORACLE


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_gold_rollup_equals_unrewritten(spark):
    dims, measures = ["country"], ["total_revenue", "total_quantity", "order_count"]
    routed, source = R.monthly_rollup(spark, SF_ORACLE, dims, measures)
    assert source == "gold"
    direct = R._rollup_from_fact(spark, SF_ORACLE, dims, measures)
    assert _rows(routed) == _rows(direct)


def test_full_grain_served_from_gold(spark):
    routed, source = R.monthly_rollup(
        spark, SF_ORACLE, ["month", "country"], ["total_revenue"]
    )
    assert source == "gold"
    direct = R._rollup_from_fact(spark, SF_ORACLE, ["month", "country"], ["total_revenue"])
    assert _rows(routed) == _rows(direct)


def test_gold_plan_reads_cube_not_fact(spark):
    routed, source = R.monthly_rollup(spark, SF_ORACLE, ["country"], ["total_revenue"])
    assert source == "gold"
    plan = plan_of(routed)
    assert "gold_month_country" in plan           # scans the cube parquet
    assert "lineitem" not in plan and "InMemoryTableScan" not in plan


def test_fallback_plan_reads_fact(spark):
    routed, source = R.monthly_rollup(
        spark, SF_ORACLE, ["mktsegment"], ["total_revenue"]
    )
    assert source == "fact"
    plan = plan_of(routed)
    assert "gold_month_country" not in plan
    assert "lineitem" in plan or "InMemoryTableScan" in plan


def test_router_rejects_unknown_measure(spark):
    with pytest.raises(ValueError, match="unknown measures"):
        R.monthly_rollup(spark, SF_ORACLE, ["country"], ["median_revenue"])


def test_router_rejects_empty_request(spark):
    with pytest.raises(ValueError, match="at least one"):
        R.monthly_rollup(spark, SF_ORACLE, [], ["total_revenue"])
