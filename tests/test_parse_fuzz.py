"""Cross-engine fuzz of the cleaning parse gates: a seeded adversarial
string corpus goes through BOTH the Spark operators and the DuckDB SQL
twins used by the oracles; every cell must agree. This pins the
regex-dialect edge (Java regex vs RE2), cast semantics, and the
strip-then-gate composition on inputs far nastier than the testdata
dirt generator produces."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    cleaning as C,
)

_FRAGMENTS = [
    "", " ", "  ", "$", "-", ".", "--", "..", "0", "7", "42", "3.14", "-1.5",
    "1.", ".5", "-.5", "1..2", "1-2", "$12.34", "12.34 USD", "N/A", "n/a",
    "NaN", "inf", "1e5", "€9,99", "12,345.67", "+7", "007", "-0", "0.00",
    "2020-03-01", "2020-03-01 10:20:30", "01/03/2020 10:20:30", "31/12/1999 23:59:59",
    "2020-13-45 99:99:99", "45/45/2020 10:20:30", "not a date", "2020-03-01T10:20:30",
    "99999999999", "123456789012345", "abc", "a1b2", "\t9\t", " 5 pcs ",
]


def _corpus(n: int = 400, seed: int = 20260813) -> list[str]:
    rng = random.Random(seed)
    out = list(_FRAGMENTS)
    alphabet = "0123456789.,-$ €USDpcs/:abcN"
    while len(out) < n:
        k = rng.randint(0, 24)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


@pytest.fixture(scope="module")
def engines(spark):
    corpus = _corpus()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(corpus)], ["i", "v"])
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus (i INT, v VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)", list(enumerate(corpus)))
    yield sdf, con
    con.close()


def _compare(spark_rows, duck_rows, corpus_note=""):
    s = {r[0]: r[1] for r in spark_rows}
    d = {r[0]: r[1] for r in duck_rows}
    assert s.keys() == d.keys()
    diffs = {i: (s[i], d[i]) for i in s if s[i] != d[i]}
    assert not diffs, f"{corpus_note}: engine disagreement {list(diffs.items())[:8]}"


def test_parse_money_agrees(engines):
    sdf, con = engines
    sp = [
        (r["i"], None if r["m"] is None else str(r["m"]))
        for r in sdf.select("i", C.parse_money("v").alias("m")).collect()
    ]
    du = con.execute(f"""
        SELECT i, CAST(CASE WHEN regexp_replace(trim(v), '{C.CURRENCY_STRIP}', '', 'g')
                                 ~ '{C.NUMERIC_GATE}'
                   THEN TRY_CAST(regexp_replace(trim(v), '{C.CURRENCY_STRIP}', '', 'g')
                             AS DECIMAL(12,2)) END AS VARCHAR) FROM corpus
    """).fetchall()
    _compare(sp, du, "parse_money")


def test_parse_int_agrees(engines):
    sdf, con = engines
    sp = [(r["i"], r["n"]) for r in sdf.select("i", C.parse_int("v").alias("n")).collect()]
    du = con.execute(f"""
        SELECT i, CASE WHEN regexp_replace(trim(v), '{C.INT_STRIP}', '', 'g')
                            ~ '{C.INT_GATE}'
                  THEN TRY_CAST(regexp_replace(trim(v), '{C.INT_STRIP}', '', 'g') AS INT) END
        FROM corpus
    """).fetchall()
    _compare(sp, du, "parse_int")


def test_parse_ts_agrees(engines):
    sdf, con = engines
    sp = [
        (r["i"], r["t"])
        for r in sdf.select(
            "i", F.date_format(C.parse_ts("v"), "yyyy-MM-dd'T'HH:mm:ss").alias("t")
        ).collect()
    ]
    du = con.execute(f"""
        SELECT i, strftime(CASE WHEN trim(v) ~ '{C.ISO_TS_GATE}' THEN TRY_CAST(trim(v) AS TIMESTAMP)
                        WHEN trim(v) ~ '{C.DMY_TS_GATE}'
                            THEN try_strptime(trim(v), '%d/%m/%Y %H:%M:%S') END,
                  '%Y-%m-%dT%H:%M:%S')
        FROM corpus
    """).fetchall()
    _compare(sp, du, "parse_ts")
