"""SCD Type-2 catalog entries: effective-dated product versions and the
as-of join attaching the version in effect at each fact event.

The reference keeps dimensions SCD1 (upsert overwrite, ETL.sql:304-315);
these entries add the history-preserving variant and its point-in-time
lookup — the standard warehouse answer to "what price did we ship at".
The change feed is synthesized deterministically from ``part`` (three
real change batches + one re-delivered no-op batch that change
suppression must drop), so both engines derive identical histories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import asof_join, scd2_build
from ..sources.tpch import read_table
from .catalog import register

#: (filter-modulus, price-delta, effective-date) change batches; the
#: final batch repeats the third's prices → suppressed as a no-op
_BATCHES = [
    (None, 0, "1995-01-01"),
    (10, 1, "1996-07-01"),
    (20, 2, "1997-07-01"),
    (20, 2, "1998-04-01"),  # re-delivered snapshot: no attribute change
]


def _product_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("stockcode"),
        F.col("p_retailprice").cast("decimal(12,2)").alias("unitprice"),
    )
    parts = []
    for mod, delta, eff in _BATCHES:
        b = base if mod is None else base.filter(F.col("stockcode").cast("long") % mod == 0)
        parts.append(
            b.select(
                "stockcode",
                (F.col("unitprice") + delta).cast("decimal(12,2)").alias("unitprice"),
                F.lit(eff).cast("date").alias("eff"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _product_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_build(
        _product_changes(spark, sf_dir), key="stockcode",
        attrs=["unitprice"], effective_col="eff",
    )


_O_SCD2_CTES = """
    base AS (
        SELECT CAST(p_partkey AS VARCHAR) AS stockcode,
               CAST(p_retailprice AS DECIMAL(12,2)) AS unitprice
        FROM part
    ),
    changes AS (
        SELECT stockcode, unitprice, DATE '1995-01-01' AS eff FROM base
        UNION ALL
        SELECT stockcode, CAST(unitprice + 1 AS DECIMAL(12,2)), DATE '1996-07-01'
        FROM base WHERE CAST(stockcode AS BIGINT) % 10 = 0
        UNION ALL
        SELECT stockcode, CAST(unitprice + 2 AS DECIMAL(12,2)), DATE '1997-07-01'
        FROM base WHERE CAST(stockcode AS BIGINT) % 20 = 0
        UNION ALL
        SELECT stockcode, CAST(unitprice + 2 AS DECIMAL(12,2)), DATE '1998-04-01'
        FROM base WHERE CAST(stockcode AS BIGINT) % 20 = 0
    ),
    flagged AS (
        SELECT *, LAG(unitprice) OVER (PARTITION BY stockcode ORDER BY eff) AS prev
        FROM changes
    ),
    real AS (
        SELECT stockcode, unitprice, eff FROM flagged
        WHERE prev IS NULL OR prev <> unitprice
    ),
    versioned AS (
        SELECT stockcode, unitprice, eff AS valid_from,
               LEAD(eff) OVER (PARTITION BY stockcode ORDER BY eff) AS valid_to
        FROM real
    )
"""


@register(
    "scd2_dim_product",
    oracle=f"""
        WITH {_O_SCD2_CTES}
        SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice,
               valid_from, valid_to, valid_to IS NULL AS is_current
        FROM versioned
    """,
    tags=("lifecycle", "scd2", "W5"),
    doc="SCD Type-2 product dimension: change feed → effective-dated "
        "versions via lag-based change suppression (the no-op re-delivery "
        "batch MUST vanish) + lead-closed half-open intervals "
        "(operators/scd.py::scd2_build; history-keeping counterpart of "
        "the SCD1 upsert, ETL.sql:304-315)",
)
def scd2_dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _product_scd2(spark, sf_dir).select(
        "stockcode", F.col("unitprice").cast("double").alias("unitprice"),
        "valid_from", "valid_to", "is_current",
    )


@register(
    "scd2_asof_lineitem_price",
    oracle=f"""
        WITH {_O_SCD2_CTES}
        SELECT f.l_orderkey, f.l_linenumber,
               CAST(f.l_partkey AS VARCHAR) AS stockcode,
               f.l_shipdate AS ship_date,
               CAST(d.unitprice AS DOUBLE) AS unitprice,
               d.valid_from AS price_valid_from
        FROM (SELECT * FROM lineitem WHERE l_orderkey % 500 = 0) f
        ASOF LEFT JOIN versioned d
          ON CAST(f.l_partkey AS VARCHAR) = d.stockcode
         AND f.l_shipdate >= d.valid_from
    """,
    tags=("lifecycle", "scd2", "asof", "J5"),
    doc="As-of join: each shipment gets the product-price version in "
        "effect at its ship date — union-and-carry-forward plan (one "
        "shuffle, no range join; operators/scd.py::asof_join). Shipments "
        "before the first version (pre-1995) keep NULL price, exercising "
        "the left-asof path. Oracle = DuckDB's native ASOF LEFT JOIN.",
)
def scd2_asof_lineitem_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 0)
        .select(
            "l_orderkey", "l_linenumber",
            F.col("l_partkey").cast("string").alias("stockcode"),
            F.col("l_shipdate").alias("ship_date"),
        )
    )
    dim = _product_scd2(spark, sf_dir).select(
        "stockcode", F.col("unitprice").cast("double").alias("unitprice"), "valid_from"
    )
    return asof_join(
        li, dim, key="stockcode", fact_time="ship_date", dim_time="valid_from",
        dim_attrs=["unitprice", "valid_from"],
    ).withColumnsRenamed({"valid_from": "price_valid_from"})


@register(
    "scd2_snapshot_asof",
    oracle=f"""
        WITH {_O_SCD2_CTES}
        SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice,
               valid_from, valid_to IS NULL AS is_open_ended
        FROM versioned
        WHERE valid_from <= DATE '1997-01-15'
          AND (valid_to IS NULL OR valid_to > DATE '1997-01-15')
    """,
    tags=("lifecycle", "scd2", "P5"),
    doc="Dimension time travel: reconstruct dim_product exactly as it "
        "stood on 1997-01-15 from the SCD2 version table — one row per "
        "key, the version whose half-open interval covers the snapshot "
        "date (mod-10 keys show their 1996 price bump, the 1997 batch "
        "is correctly invisible). The query is a pure per-row interval "
        "filter on the version table: map-side, no join, no window — "
        "at 100 TB a snapshot costs one pruned scan, which is the "
        "point of keeping SCD2 intervals instead of nightly copies.",
)
def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = F.lit("1997-01-15").cast("date")
    dim = _product_scd2(spark, sf_dir)
    return dim.filter(
        (F.col("valid_from") <= snap)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > snap))
    ).select(
        "stockcode",
        F.col("unitprice").cast("double").alias("unitprice"),
        "valid_from",
        F.col("valid_to").isNull().alias("is_open_ended"),
    )
