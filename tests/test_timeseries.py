"""Edge-semantics tests for the time-series layer (oracle gate covers
cross-engine equality; these pin the operator semantics themselves)."""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog

from .conftest import SF_ORACLE

CATALOG = get_catalog()


def test_gapfill_spine_is_dense_and_carries_forward(spark):
    rows = (
        CATALOG["ts_gapfill_daily_revenue"].fn(spark, SF_ORACLE)
        .orderBy("day")
        .collect()
    )
    days = [date.fromisoformat(r.day) for r in rows]
    assert all(b - a == timedelta(days=1) for a, b in zip(days, days[1:]))
    gaps = [i for i, r in enumerate(rows) if r.is_gap]
    assert gaps, "expected at least one calendar gap in the spine"
    for i in gaps:
        assert rows[i].revenue_filled == 0.0
        # LOCF: carry equals the nearest previous non-gap day's revenue
        j = i - 1
        while rows[j].is_gap:
            j -= 1
        assert rows[i].revenue_carry == rows[j].revenue_carry == rows[j].revenue_filled


def test_zscore_warmup_and_flag_consistency(spark):
    df = CATALOG["ts_anomaly_zscore_daily"].fn(spark, SF_ORACLE).cache()
    # first 29 days have no full trailing window -> null score and flag
    first30 = df.orderBy("day").limit(30).collect()
    assert all(r.zscore is None and r.is_anomaly is None for r in first30[:29])
    assert first30[29].zscore is not None
    # the flag is exactly |z| > 3
    bad = df.filter(
        F.col("zscore").isNotNull()
        & (F.col("is_anomaly") != (F.abs("zscore") > 3.0))
    ).count()
    assert bad == 0
    df.unpersist()


def test_percentiles_are_order_statistics(spark):
    rows = CATALOG["stats_category_percentiles"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75 <= r.p90


def test_ewma_matches_serial_fold(spark):
    """The distributed aggregate() EWMA must equal a pure-Python serial
    fold over the same date-ordered daily series — same doubles, same
    order, so equality holds BITWISE (outputs surface unrounded; see
    the entry doc for the round(double,6) cross-engine hazard)."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.timeseries import (
        _EWMA_A,
        _daily,
        ts_ewma_daily_revenue,
    )

    daily = sorted(
        (r.day, float(r.rev_dec)) for r in _daily(spark, SF_ORACLE).collect()
    )
    ewma, want = None, {}
    for day, rev in daily:
        ewma = rev if ewma is None else _EWMA_A * rev + (1 - _EWMA_A) * ewma
        want[day.strftime("%Y-%m-%d")] = (rev, ewma)
    got = {
        r.day: (r.revenue, r.ewma)
        for r in ts_ewma_daily_revenue(spark, SF_ORACLE).collect()
    }
    assert got == want


def test_holt_matches_serial_fold(spark):
    """The distributed aggregate() Holt fold (level + trend) must equal
    a pure-Python serial fold bitwise — including the twice-inlined
    level expression inside the trend update."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.timeseries import (
        _HOLT_A,
        _HOLT_B,
        _daily,
        ts_holt_linear_daily,
    )

    daily = sorted(
        (r.day, float(r.rev_dec)) for r in _daily(spark, SF_ORACLE).collect()
    )
    l = b = None
    want = {}
    for day, rev in daily:
        if l is None:
            l, b = rev, 0.0
        else:
            lt = _HOLT_A * rev + (1 - _HOLT_A) * (l + b)
            b = _HOLT_B * (lt - l) + (1 - _HOLT_B) * b
            l = lt
        want[day.strftime("%Y-%m-%d")] = (rev, l, b, l + b)
    got = {
        r.day: (r.revenue, r.level, r.trend, r.forecast_next)
        for r in ts_holt_linear_daily(spark, SF_ORACLE).collect()
    }
    assert got == want
