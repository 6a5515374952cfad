"""Serial-twin property tests for the drift/CDC cores: the scaled-
integer chi-squared must equal its pure-Python fraction-exact twin on
ANY contingency table, and the CDC apply must equal a serial op-by-op
replay of the feed regardless of arrival order."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.cdc import (
    apply_change_feed,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.drift import (
    chi2_scaled,
    chi2_scaled_serial,
)

_CELLS = st.dictionaries(
    keys=st.tuples(
        st.sampled_from(["a1", "a2", "a3"]), st.sampled_from(["b1", "b2", "b3", "b4"])
    ),
    values=st.integers(min_value=0, max_value=10**9),
    min_size=1,
    max_size=12,
).filter(lambda d: sum(d.values()) > 0)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(cells=_CELLS)
def test_chi2_scaled_matches_serial_twin(spark, cells):
    df = spark.createDataFrame(
        [(a, b, o) for (a, b), o in cells.items()], "a string, b string, o long"
    )
    row = chi2_scaled(df, "a", "b").collect()[0]
    chi2, dof, n = chi2_scaled_serial(cells)
    assert (row["chi2_millionths"], row["dof"], row["n_obs"]) == (chi2, dof, n)


def test_chi2_scaled_zero_on_perfect_independence(spark):
    """A rank-one table (o = rt*ct/n exactly) has chi2 == 0 — the
    scaled-integer floor must not manufacture a spurious statistic."""
    rows = [(f"a{i}", f"b{j}", 10 * (i + 1) * (j + 1)) for i in range(3) for j in range(4)]
    df = spark.createDataFrame(rows, "a string, b string, o long")
    row = chi2_scaled(df, "a", "b").collect()[0]
    assert row["chi2_millionths"] == 0


_OPS = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3", "k4", "k5"]),  # key
        st.sampled_from(["I", "U", "D"]),  # op
        st.integers(min_value=0, max_value=999),  # payload value
    ),
    min_size=0,
    max_size=25,
)
_BASE = st.dictionaries(
    keys=st.sampled_from(["k1", "k2", "k3"]),
    values=st.integers(min_value=0, max_value=999),
    max_size=3,
)


def _serial_replay(base: dict, feed_seq: list) -> dict:
    """Op-by-op replay in sequence order → {key: (value, src)}."""
    state = {k: (v, "base") for k, v in base.items()}
    for key, op, val in feed_seq:
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (val, "update" if key in base else "insert")
    return state


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=_BASE, ops=_OPS, seed=st.integers(min_value=0, max_value=999))
def test_cdc_apply_equals_serial_replay_any_arrival_order(spark, base, ops, seed):
    """Full-image CDC: the latest-wins distributed apply must equal the
    serial replay, and be invariant to arrival order (the feed arrives
    SHUFFLED; sequence numbers define the order)."""
    feed_seq = [(k, op, v, i) for i, (k, op, v) in enumerate(ops)]
    arrival = feed_seq[:]
    random.Random(seed).shuffle(arrival)

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [("__none__", 0)],
        "key string, val long",
    )
    if not base:
        base_df = base_df.filter(F.col("key") != "__none__")
    feed_df = spark.createDataFrame(
        [(k, op, v, s, 0) for k, op, v, s in arrival]
        or [("__none__", "U", 0, 0, 0)],
        "key string, op string, val long, seq long, tie long",
    )
    if not arrival:
        feed_df = feed_df.filter(F.col("key") != "__none__")

    out = apply_change_feed(base_df, feed_df, "key", ["val"], "seq", "tie")
    got = {r["key"]: (r["val"], r["src"]) for r in out.collect()}
    want = _serial_replay(base, [(k, op, v) for k, op, v, _ in feed_seq])
    assert got == want
