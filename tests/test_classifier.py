"""Logistic-regression trainer: serial-twin equivalence and shape
invariants (the PageRank serial-twin pattern — prove the DISTRIBUTED
gradient loop computes the same trajectory as a loop-free-to-verify
pure-Python implementation)."""

from __future__ import annotations

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    classifier as C,
)

DIM = 6


def _toy_rows():
    """Deterministic, linearly-separable-ish toy set: y depends on the
    sign of a fixed direction plus structured noise (no RNG — stable
    across runs and engines)."""
    rows = []
    for i in range(40):
        v = [((i * (j + 3) * 7919) % 97 - 48) / 48.0 for j in range(DIM)]
        y = 1.0 if (v[0] + 0.5 * v[1] - 0.25 * v[2]) > 0 else 0.0
        rows.append((v, y))
    return rows


@pytest.fixture(scope="module")
def toy_df(spark):
    rows = [(i, v, y) for i, (v, y) in enumerate(_toy_rows())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, y double")


def test_lr_fit_matches_serial_twin(spark, toy_df):
    fit = C.lr_fit(
        toy_df, iters=5, lr=0.7, dim=DIM, label_expr="y"
    ).collect()[0]
    w_ser, b_ser = C.lr_fit_serial(_toy_rows(), iters=5, lr=0.7, dim=DIM)
    # both sides round to 6 decimals at every iteration boundary; the
    # only residual divergence is a half-way rounding edge (~never), so
    # a 2e-6 tolerance is tight while non-flaky
    assert len(fit.w) == DIM
    for a, b in zip(fit.w, w_ser):
        assert abs(a - b) <= 2e-6, (fit.w, w_ser)
    assert abs(fit.b - b_ser) <= 2e-6


def test_lr_fit_learns_the_toy_direction(spark, toy_df):
    """After a few rounds the weight on the dominant generating feature
    must be positive and the model must beat the majority-class rate."""
    fit = C.lr_fit(toy_df, iters=5, lr=0.7, dim=DIM, label_expr="y")
    w = fit.collect()[0].w
    assert w[0] > 0
    scored = C.lr_score(toy_df, fit, label_expr="y")
    rows = scored.collect()
    acc = sum(1 for r in rows if r.pred == r.y) / len(rows)
    majority = max(
        sum(1 for _, y in _toy_rows() if y == 1.0),
        sum(1 for _, y in _toy_rows() if y == 0.0),
    ) / len(_toy_rows())
    assert acc >= majority


def test_lr_score_confusion_partitions_corpus(spark, toy_df):
    fit = C.lr_fit(toy_df, iters=2, lr=0.5, dim=DIM, label_expr="y")
    rows = C.lr_score(toy_df, fit, label_expr="y").collect()
    assert len(rows) == len(_toy_rows())
    for r in rows:
        assert r.pred in (0.0, 1.0)
        assert 0.0 <= r.p <= 1.0


def test_lr_fit_zero_iters_is_zero_model(spark, toy_df):
    fit = C.lr_fit(toy_df, iters=0, lr=0.5, dim=DIM, label_expr="y").collect()[0]
    assert list(fit.w) == [0.0] * DIM
    assert fit.b == 0.0
