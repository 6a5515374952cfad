"""Catalog entries for the 14-measure semantic layer (SURVEY §2.10).

Each DAX measure from the reference dashboard gets an oracle-checked
query: the scalar KPI row (measures 1-7, 11, 14 — the dashboard's KPI
cards), and one query per time-intelligence measure (8-13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import measures as M
from ..operators import windows as W
from ..sources.star import StarSchema, with_star
from ._helpers import month_str
from .catalog import register


@register(
    "measures_kpi_row",
    oracle=with_star("""
        , kpis AS (
            SELECT CAST(ROUND(SUM(totalamount), 2) AS DOUBLE) AS total_revenue,
                   COUNT(DISTINCT invoiceid) AS total_orders,
                   CAST(SUM(quantity) AS BIGINT) AS total_quantity,
                   COUNT(DISTINCT customer_key) AS n_fact_customers,
                   COUNT(CASE WHEN totalamount > 1000 THEN 1 END) AS high_value_sales
            FROM fact_sales
        ),
        custs AS (SELECT COUNT(DISTINCT customerid) AS n_customers FROM dim_customer)
        SELECT total_revenue,
               total_orders,
               total_revenue / total_orders AS arpo,
               total_revenue / n_customers AS arpc,
               total_quantity,
               total_revenue / total_quantity AS arpu,
               total_revenue / n_fact_customers AS revenue_per_customer,
               high_value_sales,
               CAST(total_quantity AS DOUBLE) / n_fact_customers AS avg_order_size_per_customer
        FROM kpis, custs
    """),
    tags=("measures", "dax1-7", "dax11", "dax14", "F16", "F22"),
    doc="Dashboard KPI row: DAX measures 1-7, 11, 14 in one scalar row — "
        "Group No.6_DAX.txt.docx m.1-7, AdvancedDAX m.11/14; ground-truth "
        "values in BASELINE.md 'Dashboard ground truth'",
)
def measures_kpi_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = StarSchema(spark, sf_dir)
    return M.evaluate(
        s.fact_sales,
        measures=[
            "total_revenue",
            "total_orders",
            "arpo",
            "arpc",
            "total_quantity",
            "arpu",
            "revenue_per_customer",
            "high_value_sales",
            "avg_order_size_per_customer",
        ],
        dim_customer=s.dim_customer,
    ).select(
        "total_revenue",
        "total_orders",
        "arpo",
        "arpc",
        "total_quantity",
        "arpu",
        "revenue_per_customer",
        "high_value_sales",
        "avg_order_size_per_customer",
    )


@register(
    "measure_monthly_revenue",
    oracle=with_star("""
        SELECT strftime(date_trunc('month', d.full_date), '%Y-%m') AS month,
               CAST(ROUND(SUM(f.totalamount), 2) AS DOUBLE) AS revenue
        FROM fact_sales f JOIN dim_date d USING (date_key)
        GROUP BY 1
    """),
    tags=("measures", "dax10"),
    doc="Measure 10 Monthly Revenue — AdvancedDAX m.10",
)
def measure_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = StarSchema(spark, sf_dir)
    return W.monthly_revenue(s.fact_sales, s.dim_date).select(
        month_str("month_start").alias("month"),
        F.round("revenue", 2).cast("double").alias("revenue"),
    )


@register(
    "measure_cumulative_revenue",
    oracle=with_star("""
        , monthly AS (
            SELECT date_trunc('month', d.full_date)::DATE AS month_start,
                   SUM(f.totalamount) AS revenue
            FROM fact_sales f JOIN dim_date d USING (date_key)
            GROUP BY 1
        )
        SELECT strftime(month_start, '%Y-%m') AS month,
               CAST(ROUND(SUM(revenue) OVER (ORDER BY month_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS cumulative_revenue
        FROM monthly
    """),
    tags=("measures", "dax13", "W3"),
    doc="Measure 13 Cumulative Revenue (running-total window) — AdvancedDAX m.13",
)
def measure_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = StarSchema(spark, sf_dir)
    monthly = W.monthly_revenue(s.fact_sales, s.dim_date)
    return W.cumulative_revenue(monthly).select(
        month_str("month_start").alias("month"), "cumulative_revenue"
    )


@register(
    "measure_rolling_3m_revenue",
    oracle=with_star("""
        , monthly AS (
            SELECT date_trunc('month', d.full_date)::DATE AS month_start,
                   year(d.full_date) * 12 + month(d.full_date) AS midx,
                   SUM(f.totalamount) AS revenue
            FROM fact_sales f JOIN dim_date d USING (date_key)
            GROUP BY 1, 2
        )
        SELECT strftime(month_start, '%Y-%m') AS month,
               CAST(ROUND(SUM(revenue) OVER (ORDER BY midx
                    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS rolling_3m_revenue
        FROM monthly
    """),
    tags=("measures", "dax12", "W4"),
    doc="Measure 12 Rolling 3M Revenue (trailing RANGE frame over a dense "
        "month index, calendar-gap safe) — AdvancedDAX m.12",
)
def measure_rolling_3m_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = StarSchema(spark, sf_dir)
    monthly = W.monthly_revenue(s.fact_sales, s.dim_date)
    return W.rolling_3m_revenue(monthly).select(
        month_str("month_start").alias("month"), "rolling_3m_revenue"
    )


@register(
    "measure_yoy_growth",
    oracle=with_star("""
        , yearly AS (
            SELECT d.year, SUM(f.totalamount) AS revenue
            FROM fact_sales f JOIN dim_date d USING (date_key)
            GROUP BY d.year
        )
        SELECT year,
               CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue,
               (CAST(revenue AS DOUBLE) - CAST(LAG(revenue) OVER (ORDER BY year) AS DOUBLE))
                 / CAST(LAG(revenue) OVER (ORDER BY year) AS DOUBLE) * 100 AS yoy_growth_pct
        FROM yearly
    """),
    tags=("measures", "dax8", "W5"),
    doc="Measure 8 YoY Growth % (yearly agg + LAG) — AdvancedDAX m.8",
)
def measure_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = StarSchema(spark, sf_dir)
    return W.yoy_growth(s.fact_sales, s.dim_date)


@register(
    "measure_top_region",
    oracle=with_star("""
        , per_country AS (
            SELECT c.country, SUM(f.totalamount) AS revenue
            FROM fact_sales f JOIN dim_customer c USING (customer_key)
            GROUP BY c.country
            ORDER BY revenue DESC, c.country
            LIMIT 1
        )
        SELECT country,
               CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue,
               country || ' — ' || format('{:,}', CAST(FLOOR(revenue) AS BIGINT))
                   AS top_region_label
        FROM per_country
    """),
    tags=("measures", "dax9", "W6", "F23"),
    doc="Measure 9 Top Region dynamic label (TOPN(1) + FORMAT '#,##0') — "
        "AdvancedDAX m.9; dashboard shows 'United Kingdom — 6,767,873'",
)
def measure_top_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = StarSchema(spark, sf_dir)
    return W.top_region_label(s.fact_sales, s.dim_customer)


#: the KPI measures in presentation order (shared by the wide row above
#: and its unpivoted long twin below)
_KPI_COLS = (
    "total_revenue", "total_orders", "arpo", "arpc", "total_quantity",
    "arpu", "revenue_per_customer", "high_value_sales",
    "avg_order_size_per_customer",
)


@register(
    "measures_kpi_unpivot",
    oracle=with_star("""
        , kpis AS (
            SELECT CAST(ROUND(SUM(totalamount), 2) AS DOUBLE) AS total_revenue,
                   COUNT(DISTINCT invoiceid) AS total_orders,
                   CAST(SUM(quantity) AS BIGINT) AS total_quantity,
                   COUNT(DISTINCT customer_key) AS n_fact_customers,
                   COUNT(CASE WHEN totalamount > 1000 THEN 1 END) AS high_value_sales
            FROM fact_sales
        ),
        custs AS (SELECT COUNT(DISTINCT customerid) AS n_customers FROM dim_customer),
        wide AS (
            SELECT CAST(total_revenue AS DOUBLE) AS total_revenue,
                   CAST(total_orders AS DOUBLE) AS total_orders,
                   total_revenue / total_orders AS arpo,
                   total_revenue / n_customers AS arpc,
                   CAST(total_quantity AS DOUBLE) AS total_quantity,
                   total_revenue / total_quantity AS arpu,
                   total_revenue / n_fact_customers AS revenue_per_customer,
                   CAST(high_value_sales AS DOUBLE) AS high_value_sales,
                   CAST(total_quantity AS DOUBLE) / n_fact_customers
                       AS avg_order_size_per_customer
            FROM kpis, custs
        )
        SELECT measure, value FROM wide
        UNPIVOT (value FOR measure IN (
            total_revenue, total_orders, arpo, arpc, total_quantity,
            arpu, revenue_per_customer, high_value_sales,
            avg_order_size_per_customer
        ))
    """),
    tags=("measures", "unpivot", "melt", "U2"),
    doc="The KPI row in LONG format via DataFrame.unpivot (melt): "
        "(measure, value) rows — the shape a generic dashboard/metrics "
        "sink ingests (one row per metric, schema-stable as measures are "
        "added). Integer counters widen to DOUBLE in the wide frame "
        "FIRST (both dialects), so the unpivot itself never casts and "
        "the values stay bit-identical to measures_kpi_row's. Oracle "
        "uses DuckDB's native UNPIVOT over the same wide CTE.",
)
def measures_kpi_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = measures_kpi_row(spark, sf_dir)
    widened = wide.select(
        *[F.col(c).cast("double").alias(c) for c in _KPI_COLS]
    )
    return widened.unpivot([], list(_KPI_COLS), "measure", "value")
