"""Catalog-wide plan-build smoke + scale-shape guard.

Plan-build (VERDICT r3 item 6): every catalog entry must ANALYZE
cleanly at sf0.001 — ``fn(spark, sf)`` plus a ``.schema`` touch, no
execution of the result.  Round 3 shipped a bench that crashed at
plan-build time (`events_sessionize` threw DATATYPE_MISMATCH after the
testdata's physical ts encoding drifted); this catches that class of
drift in milliseconds.

Scale shape (r4): the same pass scans each entry's physical plan for
the two shapes that kill a 100× scale-up —

- ``Exchange SinglePartition`` funneling DATA through one task.  The
  only allowed producer is an ungrouped (scalar) aggregate, whose
  exchange moves one partial row per upstream partition, plus a short
  documented allowlist of calendar-grain windows (cardinality bounded
  by days/months, not data size).
- ``CartesianProduct`` — every cross join in the engine must broadcast
  a scalar/1-row bound (BroadcastNestedLoopJoin), never materialize a
  true cartesian.  ``join_study_nested_loop`` is the one deliberate
  exception (a forced-degradation study, capped input).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog

from .conftest import SF_SMOKE

CATALOG = get_catalog()

#: entries whose plans legitimately contain a non-scalar-aggregate
#: single-partition stage: global windows over CALENDAR-grain aggregates
#: (≤ a few thousand rows at any corpus size — documented in
#: operators/windows.py and plans/timeseries.py).
SINGLE_PARTITION_OK = {
    "measure_cumulative_revenue",   # month grain
    "measure_rolling_3m_revenue",   # month grain
    "measure_yoy_growth",           # year grain
    "revenue_share_by_category",    # category grain (single digits)
    "ts_anomaly_zscore_daily",      # day grain
    "ts_gapfill_daily_revenue",     # day grain
    "stats_category_percentiles",   # category grain
}

#: forced-degradation join study — the only entry allowed a true
#: cartesian (its input is capped; the point is to DEMONSTRATE the
#: strategy the planner must otherwise never pick).
CARTESIAN_OK = {"join_study_nested_loop"}

#: an ungrouped aggregate directly under the exchange: its exchange
#: carries one partial row per upstream partition, not the data.
_SCALAR_AGG = re.compile(r"(Hash|Sort|ObjectHash)?Aggregate\(keys?=\[\]")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def _node_offset(line: str) -> int:
    """Column where the node NAME starts, past the tree art (spaces,
    ``:``, ``+-``). Art chars never begin a node name."""
    return len(line) - len(line.lstrip(" :+-"))


def _child_node(lines: list[str], i: int) -> str:
    """The actual child of the tree node at ``lines[i]``, found by
    indentation depth (a child's name starts exactly 3 columns deeper) —
    NOT by literal line adjacency, which AQE wrappers / ReusedExchange /
    multi-child siblings can break (ADVICE r4)."""
    off = _node_offset(lines[i])
    for nxt in lines[i + 1 :]:
        if not nxt.strip() or nxt.startswith("="):
            break  # end of this plan tree / subquery separator
        noff = _node_offset(nxt)
        if noff == off + 3:
            return nxt
        if noff <= off:
            break  # climbed back to a sibling/ancestor: node has no child
    return ""


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_entry_builds_and_scales(spark, name):
    df = CATALOG[name].fn(spark, SF_SMOKE)
    assert df.schema.fields, f"{name} produced an empty schema"

    plan = _plan_of(df)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"
    if name not in SINGLE_PARTITION_OK:
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            child = _child_node(lines, i)
            assert _SCALAR_AGG.search(child), (
                f"{name} funnels data through one partition "
                f"(non-scalar-agg SinglePartition exchange; child={child!r}):\n{plan}"
            )


def test_bench_headline_names_resolve():
    """Every bench headline / baseline-ratio name must exist in the
    catalog — a rename that orphans the bench should fail here in
    milliseconds, not at driver bench time (r3's failure mode)."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, f"bench.HEADLINE references unknown entries: {missing}"
    assert set(bench.BASELINE_REF_SEC) <= set(bench.HEADLINE), (
        "every baseline-ratio query must be benched"
    )
    # the frozen trend-line sets must stay frozen (28 + 6, all benched)
    assert len(bench.CORE) == 28, "CORE is a frozen set — extend HEADLINE instead"
    assert set(bench.CORE) <= set(bench.HEADLINE)
    assert len(bench.CORE_R10) == 6, (
        "CORE_R10 is a frozen set — extend HEADLINE instead"
    )
    assert set(bench.CORE_R10) <= set(bench.HEADLINE)
    assert not set(bench.CORE_R10) & set(bench.CORE)
    # compact stdout contract: the emitted subset (cores ∪ baseline
    # rows) must leave margin inside the driver's ~2000-char tail
    # capture — name lengths + ~10 chars of timing each (the full
    # HEADLINE set is allowed to grow; it lives in BENCH_DETAIL.json)
    emitted = (
        set(bench.CORE) | set(bench.CORE_R10) | set(bench.BASELINE_REF_SEC)
    )
    est = 160 + sum(len(n) + 10 for n in emitted)
    assert est < 1800, f"compact query subset too large for the one-line contract ({est} est. chars)"
