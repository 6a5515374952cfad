"""Randomized model-based test for the MERGE INTO statement router
(operators/table_format.py::_route_merge): random clause scripts
(UPDATE/DELETE with AND-guards in random order, INSERT */VALUES) over
random base/source tables must leave the table in exactly the state a
driver-side first-match-wins reference model computes. The generated
expressions come from a closed set with Python twins, so the model is
independent of Spark's evaluator."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    table_format as tf,
)

#: (SQL text, python twin over (trow, srow)) — matched-clause guards
_M_CONDS = [
    ("t.k % 2 = 0", lambda t, s: t["k"] % 2 == 0),
    ("s.v > 50", lambda t, s: s["v"] > 50),
    ("t.v >= s.v", lambda t, s: t["v"] >= s["v"]),
    (None, lambda t, s: True),
]
#: not-matched guards reference the source only
_NM_CONDS = [
    ("s.v % 3 = 0", lambda s: s["v"] % 3 == 0),
    (None, lambda s: True),
]
#: UPDATE SET scripts: (sql, python image fn over (trow, srow))
_SETS = [
    (
        "v = s.v + t.v",
        lambda t, s: {"k": t["k"], "v": s["v"] + t["v"], "w": t["w"]},
    ),
    (
        "v = s.v, w = 'UPD'",
        lambda t, s: {"k": t["k"], "v": s["v"], "w": "UPD"},
    ),
    (
        "w = concat(t.w, '+')",
        lambda t, s: {"k": t["k"], "v": t["v"], "w": t["w"] + "+"},
    ),
]
#: INSERT actions: (sql, python image fn over srow)
_INSERTS = [
    ("INSERT *", lambda s: {"k": s["k"], "v": s["v"], "w": s["w"]}),
    (
        "INSERT (k, v, w) VALUES (s.k, s.v * 2, 'NEW')",
        lambda s: {"k": s["k"], "v": s["v"] * 2, "w": "NEW"},
    ),
]


def _model(base, source, matched_clauses, nm_clause):
    """First-match-wins reference application."""
    out = {r["k"]: dict(r) for r in base}
    src_by_key = {r["k"]: r for r in source}
    for k, s in src_by_key.items():
        t = out.get(k)
        if t is not None:
            for kind, cond_fn, img_fn in matched_clauses:
                if cond_fn(t, s):
                    if kind == "delete":
                        del out[k]
                    else:
                        out[k] = img_fn(t, s)
                    break
        else:
            if nm_clause is not None:
                cond_fn, img_fn = nm_clause
                if cond_fn(s):
                    out[k] = img_fn(s)
    return sorted((r["k"], r["v"], r["w"]) for r in out.values())


@pytest.mark.parametrize("seed", [3, 17, 41, 88])
def test_merge_statement_matches_reference_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    base = [
        {"k": k, "v": rng.randrange(100), "w": rng.choice("abc")}
        for k in rng.sample(range(30), 18)
    ]
    source = [
        {"k": k, "v": rng.randrange(100), "w": rng.choice("xyz")}
        for k in rng.sample(range(40), 20)
    ]
    root = str(tmp_path / f"m{seed}")
    tf.create_table(
        spark, root,
        spark.createDataFrame(
            [(r["k"], r["v"], r["w"]) for r in base], "k long, v long, w string"
        ),
        files=2,
    )
    spark.createDataFrame(
        [(r["k"], r["v"], r["w"]) for r in source], "k long, v long, w string"
    ).createOrReplaceTempView(f"merge_model_src_{seed}")

    # random script: 1-3 matched clauses (at most one DELETE, random
    # position), optional not-matched INSERT; at least one clause total
    matched, m_sql = [], []
    n_m = rng.randrange(0, 4)
    delete_at = rng.randrange(0, n_m) if n_m and rng.random() < 0.5 else -1
    for i in range(n_m):
        cond_sql, cond_fn = rng.choice(_M_CONDS)
        and_txt = f" AND {cond_sql}" if cond_sql else ""
        if i == delete_at:
            matched.append(("delete", cond_fn, None))
            m_sql.append(f"WHEN MATCHED{and_txt} THEN DELETE")
        else:
            set_sql, img_fn = rng.choice(_SETS)
            matched.append(("update", cond_fn, img_fn))
            m_sql.append(f"WHEN MATCHED{and_txt} THEN UPDATE SET {set_sql}")
    nm_clause, nm_sql = None, ""
    if rng.random() < 0.8 or not matched:
        cond_sql, cond_fn = rng.choice(_NM_CONDS)
        ins_sql, img_fn = rng.choice(_INSERTS)
        and_txt = f" AND {cond_sql}" if cond_sql else ""
        nm_clause = (cond_fn, img_fn)
        nm_sql = f"WHEN NOT MATCHED{and_txt} THEN {ins_sql}"

    stmt = (
        f"MERGE INTO demo AS t USING merge_model_src_{seed} AS s "
        f"ON t.k = s.k " + " ".join(m_sql) + (" " + nm_sql if nm_sql else "")
    )
    rec = tf.sql(spark, {"demo": root}, stmt).first()
    assert rec.op == "merge" and rec.version == 1

    got = sorted(
        (r.k, r.v, r.w) for r in tf.read_version(spark, root).collect()
    )
    want = _model(base, source, matched, nm_clause)
    assert got == want, f"stmt={stmt!r}"
