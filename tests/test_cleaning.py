"""Cleaning-pipeline unit tests beyond the oracle gate: reject JSON
payloads, parse-gate edge cases, and conservation (fact + rejects ==
cleaned staging)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    cleaning as C,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.cleaning_queries import (
    _stg_products_df,
    _stg_sales_df,
)

from .conftest import SF_SMOKE


def _pipeline(spark):
    products = C.clean_products(_stg_products_df(spark, SF_SMOKE))
    sales = C.clean_sales(_stg_sales_df(spark, SF_SMOKE), products)
    fact, rejects = C.build_fact_with_rejects(sales, products)
    return products, sales, fact, rejects


def test_reject_json_payload_roundtrips(spark):
    _, _, _, rejects = _pipeline(spark)
    rows = rejects.limit(10).collect()
    assert rows, "dirt generator should produce orphan stockcodes"
    for r in rows:
        payload = json.loads(r["source_row"])
        assert payload["invoiceid"] == r["invoiceid"]
        assert payload["stockcode"] == r["stockcode"]
        assert r["reject_reason"].startswith("Missing")


def test_reject_reasons_classified_per_cause(spark):
    _, sales, _, rejects = _pipeline(spark)
    reasons = {r["reject_reason"] for r in rejects.select("reject_reason").distinct().collect()}
    # the dirt generator plants all three failure classes
    assert {"Missing product mapping", "Missing date mapping", "Missing quantity"} <= reasons
    # the log covers every failing row, classified by the CASE priority
    p_miss = F.col("reject_reason").startswith("Missing product")
    n_date = rejects.filter(~p_miss & (F.col("reject_reason") == "Missing date mapping")).count()
    want_date = (
        sales.join(
            rejects.filter(p_miss).select("invoiceid", "stockcode").distinct(),
            ["invoiceid", "stockcode"],
            "left_anti",
        )
        .filter(F.col("dt_ts").isNull())
        .count()
    )
    assert n_date == want_date > 0


def test_conservation_fact_plus_rejects(spark):
    _, sales, fact, rejects = _pipeline(spark)
    # the fact's complement is the product-miss subset of the log; the
    # log additionally carries date/quantity advisories for loaded rows
    skipped = rejects.filter(F.col("reject_reason").startswith("Missing product"))
    assert sales.count() == fact.count() + skipped.count()
    assert rejects.count() >= skipped.count()


def test_parse_gates(spark):
    df = spark.createDataFrame(
        [("$12.34",), ("12.34 USD",), ("N/A",), ("  7 ",), ("",), ("-1.5",), (None,)],
        ["v"],
    )
    got = [
        (r["m"], r["i"])
        for r in df.select(
            C.parse_money("v").alias("m"), C.parse_int("v").alias("i")
        ).collect()
    ]
    money = [str(m) if m is not None else None for m, _ in got]
    ints = [i for _, i in got]
    assert money == ["12.34", "12.34", None, "7.00", None, "-1.50", None]
    # strip-then-cast semantics: "-1.5" loses the dot and parses as -15,
    # exactly what the reference's REGEXP_REPLACE-then-:: cast does
    assert ints == [1234, 1234, None, 7, None, -15, None]


def test_ts_parse_both_formats(spark):
    df = spark.createDataFrame(
        [("2020-03-01 10:20:30",), ("01/03/2020 10:20:30",), ("garbage",)], ["v"]
    )
    got = [r["t"] for r in df.select(C.parse_ts("v").alias("t")).collect()]
    assert got[0] == got[1]
    assert got[0] is not None and got[2] is None


def test_smart_date_key_null_default(spark):
    df = spark.createDataFrame([("2020-03-01 10:20:30",), (None,)], ["v"])
    got = [
        r["k"]
        for r in df.select(
            C.smart_date_key(F.col("v").cast("timestamp")).alias("k")
        ).collect()
    ]
    assert got == [20200301102030, C.NULL_DATE_KEY]


def test_price_fix_never_leaves_nonpositive(spark):
    _, sales, _, _ = _pipeline(spark)
    # after the join-update, unit prices are either NULL (unmatched dim,
    # original unparseable) or strictly positive — never <= 0
    assert sales.filter(F.col("unitprice_num") <= 0).count() == 0
