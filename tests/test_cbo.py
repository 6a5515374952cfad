"""CBO statistics demo: the stats-on/stats-off explain diff for the
ANALYZE lifecycle entry (plans/cbo_queries.py) — the join strategy must
FLIP with column statistics present, under an identical query and an
identical broadcast threshold. (The entry's data is pinned by the
oracle gate; this pins the optimizer decision itself.)"""

from __future__ import annotations

import contextlib
import io

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.cbo_queries import (
    cbo_join_frame,
    ensure_stats_tables,
    stats_table_names,
)

from .conftest import SF_ORACLE


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@contextlib.contextmanager
def confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


#: a threshold between the CBO's post-filter estimate (~2% of customer
#: pruned to (key, name) ≈ 1 KB at sf0.01) and the size-only estimate
#: of the same pruned projection (~12 KB at sf0.01 — Filter passes its
#: child size through untouched without column stats). The flip test is
#: scale-pinned at SF_ORACLE (sf0.01); at other scales both estimates
#: shift together and the threshold would need re-centering.
_THRESHOLD = 4 * 1024


def test_stats_flip_join_strategy(spark):
    ensure_stats_tables(spark, SF_ORACLE)
    base = dict(
        spark__sql__autoBroadcastJoinThreshold=str(_THRESHOLD),
        spark__sql__adaptive__enabled="false",
    )
    with confs(spark, **base, spark__sql__cbo__enabled="false"):
        plan_off = explain_str(cbo_join_frame(spark, SF_ORACLE))
    with confs(spark, **base, spark__sql__cbo__enabled="true"):
        plan_on = explain_str(cbo_join_frame(spark, SF_ORACLE))
    assert "SortMergeJoin" in plan_off and "BroadcastHashJoin" not in plan_off, (
        "size-only estimation must NOT broadcast the filtered dim under "
        f"a {_THRESHOLD}B threshold:\n{plan_off}"
    )
    assert "BroadcastHashJoin" in plan_on, (
        "column stats + CBO must shrink the filter estimate below the "
        f"threshold and broadcast:\n{plan_on}"
    )


def test_analyzed_tables_have_column_stats(spark):
    ensure_stats_tables(spark, SF_ORACLE)
    cust_t, _ = stats_table_names(SF_ORACLE)
    desc = spark.sql(
        f"DESCRIBE EXTENDED {cust_t} c_acctbal"
    ).collect()
    kv = {r.info_name: r.info_value for r in desc}
    assert kv.get("min") not in (None, "NULL"), kv
    assert kv.get("distinct_count") not in (None, "NULL", "0"), kv
