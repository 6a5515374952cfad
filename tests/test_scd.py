"""SCD2 / as-of operator semantics (operators/scd.py): change
suppression, interval closing, tie visibility, and pre-history NULLs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.scd import (
    asof_join,
    scd2_build,
)


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _changes(spark):
    rows = [
        ("p1", 10.0, d("2020-01-01")),
        ("p1", 12.0, d("2020-06-01")),
        ("p1", 12.0, d("2020-09-01")),  # no-op redelivery -> suppressed
        ("p1", 11.0, d("2021-01-01")),
        ("p2", 5.0, d("2020-03-01")),
    ]
    return spark.createDataFrame(rows, ["k", "price", "eff"])


def test_scd2_suppresses_noops_and_closes_intervals(spark):
    out = scd2_build(_changes(spark), "k", ["price"], "eff")
    got = {
        (r.k, r.price, str(r.valid_from), str(r.valid_to) if r.valid_to else None, r.is_current)
        for r in out.collect()
    }
    assert got == {
        ("p1", 10.0, "2020-01-01", "2020-06-01", False),
        ("p1", 12.0, "2020-06-01", "2021-01-01", False),  # no-op skipped; interval spans it
        ("p1", 11.0, "2021-01-01", None, True),
        ("p2", 5.0, "2020-03-01", None, True),
    }


def test_asof_tie_and_prehistory_null(spark):
    dim = scd2_build(_changes(spark), "k", ["price"], "eff")
    facts = spark.createDataFrame(
        [
            ("f0", "p1", d("2019-12-31")),  # before first version -> NULL
            ("f1", "p1", d("2020-01-01")),  # tie: version effective AT event visible
            ("f2", "p1", d("2020-08-15")),  # inside the suppressed-noop span
            ("f3", "p1", d("2021-02-01")),  # current version
            ("f4", "p2", d("2020-03-01")),
        ],
        ["fid", "k", "ts"],
    )
    out = asof_join(facts, dim, "k", "ts", "valid_from", ["price"])
    got = {r.fid: r.price for r in out.collect()}
    assert got == {"f0": None, "f1": 10.0, "f2": 12.0, "f3": 11.0, "f4": 5.0}


def test_asof_null_attr_in_newer_version_wins(spark):
    """A NULL attribute in the newest version must NOT fall through to
    the older version's value (struct carry-forward, not per-column)."""
    dim = spark.createDataFrame(
        [("p1", d("2020-01-01"), 10.0), ("p1", d("2020-06-01"), None)],
        ["k", "valid_from", "price"],
    )
    facts = spark.createDataFrame([("f1", "p1", d("2020-07-01"))], ["fid", "k", "ts"])
    out = asof_join(facts, dim, "k", "ts", "valid_from", ["price"])
    assert out.collect()[0].price is None
