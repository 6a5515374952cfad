"""Incremental correctness-gate mode (r11 — verdict #6): the
changed-entries-only sweep must ALWAYS re-verify a touched entry —
fingerprints move when the plan or oracle changes, and only
green-under-the-same-fingerprint records carry forward."""

from __future__ import annotations

import correctness_local as CL


def test_normalize_plan_strips_session_noise():
    a = "Project [c_custkey#123L, sum#456 AS total#789]\n+- Relation t__v3"
    b = "Project [c_custkey#7L, sum#8 AS total#9]\n+- Relation t__v12"
    assert CL._normalize_plan(a) == CL._normalize_plan(b)
    # a REAL plan difference survives normalization
    c = "Project [c_custkey#7L, max#8 AS total#9]\n+- Relation t__v12"
    assert CL._normalize_plan(a) != CL._normalize_plan(c)


def test_needs_rerun_decision_table():
    good = {
        "fingerprint": "abc", "err": None,
        "rows_match": True, "schema_match": True, "hash_match": True,
    }
    # unchanged + green: carry forward
    assert not CL.needs_rerun(good, "abc")
    # fingerprint moved (entry or oracle touched): ALWAYS re-verify
    assert CL.needs_rerun(good, "def")
    # never recorded / artifact predates fingerprints
    assert CL.needs_rerun(None, "abc")
    assert CL.needs_rerun({k: v for k, v in good.items()
                           if k != "fingerprint"}, "abc")
    # previously red in any way: re-verify even if unchanged
    assert CL.needs_rerun({**good, "err": "boom"}, "abc")
    assert CL.needs_rerun({**good, "rows_match": False}, "abc")
    assert CL.needs_rerun({**good, "schema_match": False}, "abc")
    assert CL.needs_rerun({**good, "hash_match": False}, "abc")
    # rows-only entries record hash_match=None — that is green
    assert not CL.needs_rerun({**good, "hash_match": None}, "abc")


def test_entry_fingerprint_moves_with_oracle(spark):
    df = spark.range(3).selectExpr("id AS k", "id * 2 AS v")
    f1 = CL.entry_fingerprint(df, "SELECT 1")
    f2 = CL.entry_fingerprint(df, "SELECT 2")
    f3 = CL.entry_fingerprint(
        spark.range(3).selectExpr("id AS k", "id * 3 AS v"), "SELECT 1"
    )
    assert f1 != f2  # oracle change moves it
    assert f1 != f3  # plan change moves it
    # and rebuilding the SAME frame fingerprints identically (fresh
    # expression ids must not move it)
    df_again = spark.range(3).selectExpr("id AS k", "id * 2 AS v")
    assert CL.entry_fingerprint(df_again, "SELECT 1") == f1
