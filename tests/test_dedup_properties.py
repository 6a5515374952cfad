"""Property-based tests (hypothesis) for the dedup operators: for ANY
generated dataset, latest-wins keeps exactly one row per key — the max
order value with the deterministic tiebreak — and exact dedup groups
partition the input. Complements the fixed-corpus oracle checks."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.dedup import (
    exact_dedup_groups,
    latest_wins,
)

_KEYS = st.sampled_from(["k1", "k2", "k3", "k4"])
_ORDERS = st.one_of(st.none(), st.integers(min_value=0, max_value=9))
_ROWS = st.lists(
    st.tuples(_KEYS, _ORDERS, st.integers(min_value=0, max_value=99)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_latest_wins_properties(spark, rows):
    df = spark.createDataFrame(
        [(k, o, f"{k}-{o}-{t}") for k, o, t in rows],
        "key string, ord int, tie string",
    )
    out = latest_wins(df, "key", "ord", "tie").collect()
    # exactly one survivor per distinct key
    assert sorted(r["key"] for r in out) == sorted({k for k, _, _ in rows})
    by_key: dict[str, list[tuple]] = {}
    for k, o, t in rows:
        by_key.setdefault(k, []).append((k, o, f"{k}-{o}-{t}"))
    for r in out:
        cands = by_key[r["key"]]
        # survivor has the max non-null order (nulls last) …
        orders = [o for _, o, _ in cands if o is not None]
        if orders:
            assert r["ord"] == max(orders)
            # … and among ties, the max tiebreak string
            best_tie = max(t for _, o, t in cands if o == max(orders))
        else:
            assert r["ord"] is None
            best_tie = max(t for _, _, t in cands)
        assert r["tie"] == best_tie


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=20
    )
)
def test_exact_dedup_partitions_input(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    groups = exact_dedup_groups(df, "doc_id", "text").collect()
    assert sum(r["n_docs"] for r in groups) == len(texts)
    # keep_doc_id is the min id of its group, and ids are valid
    keeps = [r["keep_doc_id"] for r in groups]
    assert len(set(keeps)) == len(keeps)
    assert all(0 <= k < len(texts) for k in keeps)
