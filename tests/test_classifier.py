"""Logistic-regression trainer: serial-twin equivalence and shape
invariants (the PageRank serial-twin pattern — prove the DISTRIBUTED
gradient loop computes the same trajectory as a loop-free-to-verify
pure-Python implementation)."""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE

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


def test_auc_matches_serial_rank_sum(spark):
    """lr_eval_auc's exact-integer Mann-Whitney decomposition must equal
    a pure-Python tie-aware rank-sum AUC over the same scored frame."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        classifier as C,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.classifier_queries import (
        _DIM,
        _ITERS,
        _LR,
        lr_eval_auc,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        read_table,
    )

    emb = read_table(spark, SF_ORACLE, "embeddings")
    fit = C.lr_fit(emb, iters=_ITERS, lr=_LR, dim=_DIM)
    scored = [(r.p, r.y) for r in C.lr_score(emb, fit).collect()]

    # serial tie-aware average ranks
    by_p = sorted(scored)
    ranks, i = {}, 0
    pos_rank_sum = 0.0
    while i < len(by_p):
        j = i
        while j < len(by_p) and by_p[j][0] == by_p[i][0]:
            j += 1
        avg_rank = (i + 1 + j) / 2.0  # ranks i+1..j inclusive
        for k in range(i, j):
            if by_p[k][1] == 1:
                pos_rank_sum += avg_rank
        i = j
    n_pos = sum(1 for _, y in scored if y == 1)
    n_neg = len(scored) - n_pos
    want = (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)

    row = lr_eval_auc(spark, SF_ORACLE).collect()[0]
    assert (row.n, row.n_pos, row.n_neg) == (len(scored), n_pos, n_neg)
    assert row.auc == pytest.approx(want, abs=5e-7)  # entry rounds to 6 dec
