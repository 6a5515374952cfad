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


# --------------------------------------------------- r11: compound keys
# + WHEN NOT MATCHED BY SOURCE, against the same driver-side model

#: BY SOURCE guards/actions reference the TARGET alias only
_NMS_CONDS = [
    ("t.v < 50", lambda t: t["v"] < 50),
    ("t.k2 % 2 = 0", lambda t: t["k2"] % 2 == 0),
    (None, lambda t: True),
]
_NMS_SETS = [
    ("w = 'STALE'", lambda t: {**t, "w": "STALE"}),
    ("v = t.v + 1", lambda t: {**t, "v": t["v"] + 1}),
]


def _model_compound(base, source, matched_clauses, nm_clause, nms_clauses):
    """First-match-wins reference over composite (k1, k2) keys, with the
    three clause categories: MATCHED, NOT MATCHED (insert), NOT MATCHED
    BY SOURCE (target rows whose key has no source row)."""
    kf = lambda r: (r["k1"], r["k2"])  # noqa: E731
    out = {kf(r): dict(r) for r in base}
    src_by_key = {kf(r): r for r in source}
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
        elif nm_clause is not None:
            cond_fn, img_fn = nm_clause
            if cond_fn(s):
                out[k] = img_fn(s)
    for k in list(out):
        if k in src_by_key:
            continue
        t = out[k]
        if kf(t) != k:
            continue  # an inserted row (always in src_by_key; safety)
        for kind, cond_fn, img_fn in nms_clauses:
            if cond_fn(t):
                if kind == "delete":
                    del out[k]
                else:
                    out[k] = img_fn(t)
                break
    return sorted(
        (r["k1"], r["k2"], r["v"], r["w"]) for r in out.values()
    )


@pytest.mark.parametrize("seed", [7, 23, 59, 101])
def test_merge_compound_key_by_source_matches_model(spark, tmp_path, seed):
    """Compound AND-of-equalities ON + randomized WHEN NOT MATCHED BY
    SOURCE scripts (r11 — verdict #2): the routed statement must leave
    the table in the model's state. (k1, k2) are INDEPENDENT small
    domains, so composite keys genuinely collide on each component —
    a router that keyed on either column alone diverges immediately."""
    rng = random.Random(seed)
    all_keys = [(a, b) for a in range(6) for b in range(6)]
    base = [
        {"k1": a, "k2": b, "v": rng.randrange(100), "w": rng.choice("abc")}
        for a, b in rng.sample(all_keys, 20)
    ]
    source = [
        {"k1": a, "k2": b, "v": rng.randrange(100), "w": rng.choice("xyz")}
        for a, b in rng.sample(all_keys, 22)
    ]
    root = str(tmp_path / f"mc{seed}")
    tf.create_table(
        spark, root,
        spark.createDataFrame(
            [(r["k1"], r["k2"], r["v"], r["w"]) for r in base],
            "k1 long, k2 long, v long, w string",
        ),
        files=2,
    )
    spark.createDataFrame(
        [(r["k1"], r["k2"], r["v"], r["w"]) for r in source],
        "k1 long, k2 long, v long, w string",
    ).createOrReplaceTempView(f"merge_cmp_src_{seed}")

    # matched clauses reuse the single-key pools (k2 plays v's old role
    # in none of them — conditions reference k/v/w; remap k -> k1)
    matched, m_sql = [], []
    n_m = rng.randrange(0, 3)
    delete_at = rng.randrange(0, n_m) if n_m and rng.random() < 0.5 else -1
    m_conds = [
        ("t.k1 % 2 = 0", lambda t, s: t["k1"] % 2 == 0),
        ("s.v > 50", lambda t, s: s["v"] > 50),
        (None, lambda t, s: True),
    ]
    m_sets = [
        (
            "v = s.v + t.v",
            lambda t, s: {**t, "v": s["v"] + t["v"]},
        ),
        (
            "v = s.v, w = 'UPD'",
            lambda t, s: {**t, "v": s["v"], "w": "UPD"},
        ),
    ]
    for i in range(n_m):
        cond_sql, cond_fn = rng.choice(m_conds)
        and_txt = f" AND {cond_sql}" if cond_sql else ""
        if i == delete_at:
            matched.append(("delete", cond_fn, None))
            m_sql.append(f"WHEN MATCHED{and_txt} THEN DELETE")
        else:
            set_sql, img_fn = rng.choice(m_sets)
            matched.append(("update", cond_fn, img_fn))
            m_sql.append(f"WHEN MATCHED{and_txt} THEN UPDATE SET {set_sql}")
    nm_clause, nm_sql = None, ""
    if rng.random() < 0.7:
        nm_clause = (lambda s: True, lambda s: dict(s))
        nm_sql = "WHEN NOT MATCHED THEN INSERT *"
    # 1-2 BY SOURCE clauses (at most one DELETE, random order)
    nms, nms_sql = [], []
    n_s = rng.randrange(1, 3)
    s_delete_at = rng.randrange(0, n_s) if rng.random() < 0.6 else -1
    for i in range(n_s):
        cond_sql, cond_fn = rng.choice(_NMS_CONDS)
        and_txt = f" AND {cond_sql}" if cond_sql else ""
        if i == s_delete_at:
            nms.append(("delete", cond_fn, None))
            nms_sql.append(
                f"WHEN NOT MATCHED BY SOURCE{and_txt} THEN DELETE"
            )
        else:
            set_sql, img_fn = rng.choice(_NMS_SETS)
            nms.append(("update", cond_fn, img_fn))
            nms_sql.append(
                f"WHEN NOT MATCHED BY SOURCE{and_txt} "
                f"THEN UPDATE SET {set_sql}"
            )

    stmt = (
        f"MERGE INTO demo AS t USING merge_cmp_src_{seed} AS s "
        f"ON t.k1 = s.k1 AND s.k2 = t.k2 "
        + " ".join(m_sql)
        + (" " + nm_sql if nm_sql else "")
        + " " + " ".join(nms_sql)
    )
    rec = tf.sql(spark, {"demo": root}, stmt).first()
    assert rec.op == "merge" and rec.version == 1

    got = sorted(
        (r.k1, r.k2, r.v, r.w)
        for r in tf.read_version(spark, root).collect()
    )
    want = _model_compound(base, source, matched, nm_clause, nms)
    assert got == want, f"stmt={stmt!r}"


def test_merge_strict_mode_raises_on_duplicate_source_keys(spark, tmp_path):
    """strict_merge=True enforces the Delta cardinality contract: two
    source rows matching one target key raise instead of silently
    tiebreaking; the same statement without strict commits."""
    root = str(tmp_path / "strict")
    tf.create_table(
        spark, root,
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k long, v long, w string"),
        files=1,
    )
    spark.createDataFrame(
        [(1, 100, "x"), (1, 200, "y"), (2, 300, "z")], "k long, v long, w string"
    ).createOrReplaceTempView("strict_dup_src")
    stmt = (
        "MERGE INTO demo AS t USING strict_dup_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    with pytest.raises(ValueError, match="cardinality violation"):
        tf.sql(spark, {"demo": root}, stmt, strict_merge=True)
    # nothing committed by the failed strict attempt
    assert tf.list_versions(root) == [0]
    rec = tf.sql(spark, {"demo": root}, stmt).first()
    assert rec.version == 1  # non-strict: deterministic tiebreak applies


def test_merge_strict_mode_tolerates_duplicate_target_keys(spark, tmp_path):
    """The cardinality contract is about the SOURCE feed: a
    duplicate-keyed TARGET (broken table invariant, not a feed problem)
    with a unique-keyed source must NOT trip the strict check (ADVICE
    r11 #3 — the old target-side groupBy misattributed it)."""
    root = str(tmp_path / "strict_tgt")
    tf.create_table(
        spark, root,
        spark.createDataFrame(
            [(1, 10, "a"), (1, 11, "a2"), (2, 20, "b")],
            "k long, v long, w string",
        ),
        files=1,
    )
    spark.createDataFrame(
        [(1, 100, "x"), (3, 300, "z")], "k long, v long, w string"
    ).createOrReplaceTempView("strict_uni_src")
    stmt = (
        "MERGE INTO demo AS t USING strict_uni_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rec = tf.sql(spark, {"demo": root}, stmt, strict_merge=True).first()
    assert rec.version == 1
    rows = sorted(
        (r.k, r.v) for r in tf.read_version(spark, root).collect()
    )
    # both duplicate target rows took the single source image
    assert rows == [(1, 100), (1, 100), (2, 20), (3, 300)]


def test_merge_rejects_key_reassignment_and_bad_inserts(spark, tmp_path):
    """The r11 Delta-contract guards: UPDATE SET on an ON key raises
    (both MATCHED and BY SOURCE), INSERT column lists must include the
    key, and INSERT * with extra source columns raises."""
    root = str(tmp_path / "guards")
    tf.create_table(
        spark, root,
        spark.createDataFrame([(1, 10, "a")], "k long, v long, w string"),
        files=1,
    )
    spark.createDataFrame(
        [(1, 100, "x")], "k long, v long, w string"
    ).createOrReplaceTempView("guard_src")
    spark.createDataFrame(
        [(1, 100, "x", 5)], "k long, v long, w string, extra long"
    ).createOrReplaceTempView("guard_src_wide")
    t = {"demo": root}
    with pytest.raises(ValueError, match="may not assign ON key"):
        tf.sql(spark, t, (
            "MERGE INTO demo AS t USING guard_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET k = s.k + 1"
        ))
    with pytest.raises(ValueError, match="may not assign ON key"):
        tf.sql(spark, t, (
            "MERGE INTO demo AS t USING guard_src AS s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET k = t.k + 1"
        ))
    with pytest.raises(ValueError, match="must include the ON key"):
        tf.sql(spark, t, (
            "MERGE INTO demo AS t USING guard_src AS s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (v, w) VALUES (s.v, s.w)"
        ))
    with pytest.raises(ValueError, match="absent from the target"):
        tf.sql(spark, t, (
            "MERGE INTO demo AS t USING guard_src_wide AS s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT *"
        ))
    assert tf.list_versions(root) == [0]  # every rejection pre-commit
