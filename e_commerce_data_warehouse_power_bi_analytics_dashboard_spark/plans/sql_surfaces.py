"""SQL-parser surfaces (Spark 4): recursive CTEs and correlated LATERAL
subqueries — the two decision-support SQL constructs the DataFrame-DSL
entries don't exercise.

Both entries run through ``spark.sql`` on purpose: the parser/analyzer
path (CTE resolution, subquery decorrelation) is part of the engine
surface a reference user would migrate, and these constructs have no
1:1 DSL spelling.

Scale notes:
  - The recursive CTE unions one generation per step driver-side but
    each step is a distributed plan; here the recursion is bounded by
    the CALENDAR (≤ months-in-domain steps of 1-row frames), the same
    bounded-cardinality argument as the documented calendar-grain
    windows. Unbounded recursion over data-sized frames would instead
    use the iterative operators (CC / PageRank patterns).
  - The correlated LATERAL LIMIT is DECORRELATED by Catalyst into one
    partitioned window + broadcast join (verified in the physical plan
    — no per-outer-row re-execution), so the per-nation top-k costs one
    customer shuffle total, not |nation| subquery runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tpch import read_table
from .catalog import register

#: view prefix so these SQL entries never clobber other entries' views
_P = "sqlsf_"


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(_P + t)


@register(
    "sql_recursive_month_spine",
    oracle="""
        WITH RECURSIVE spine(m) AS (
            SELECT date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM spine
            WHERE m < date_trunc('month', (SELECT MAX(o_orderdate) FROM orders))
        ),
        rev AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                       AS revenue
            FROM orders GROUP BY 1
        )
        SELECT strftime(spine.m, '%Y-%m') AS month,
               CAST(COALESCE(rev.revenue, 0) AS DOUBLE) AS revenue,
               (rev.m IS NULL) AS is_gap
        FROM spine LEFT JOIN rev ON spine.m = rev.m
    """,
    tags=("sql", "recursive-cte", "W3", "F14"),
    doc="Recursive CTE month spine (Spark 4 WITH RECURSIVE): generate "
        "every month between the first and last order by recursion, "
        "left-join monthly revenue, flag gap months — the recursive-SQL "
        "spelling of ts_gapfill_daily_revenue's sequence() spine, "
        "exercising the parser/analyzer recursion path end-to-end. "
        "Recursion depth is calendar-bounded (1-row frames per step); "
        "data-sized iteration belongs to the CC/PageRank operators.",
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH RECURSIVE spine(m) AS (
            SELECT date_trunc('month', (SELECT MIN(o_orderdate) FROM {_P}orders))
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM spine
            WHERE m < date_trunc('month', (SELECT MAX(o_orderdate) FROM {_P}orders))
        ),
        rev AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                       AS revenue
            FROM {_P}orders GROUP BY 1
        )
        SELECT date_format(spine.m, 'yyyy-MM') AS month,
               CAST(COALESCE(rev.revenue, 0) AS DOUBLE) AS revenue,
               (rev.m IS NULL) AS is_gap
        FROM spine LEFT JOIN rev ON spine.m = rev.m
    """)


@register(
    "sql_lateral_top2_customers",
    oracle="""
        SELECT n.n_name AS nation, c.customer, c.acctbal
        FROM nation n,
        LATERAL (
            SELECT c_name AS customer, CAST(c_acctbal AS DOUBLE) AS acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) c
    """,
    tags=("sql", "lateral", "J9", "T2"),
    doc="Correlated LATERAL subquery with per-outer-row LIMIT: top-2 "
        "customers by account balance for every nation. Catalyst "
        "DECORRELATES it into one partitioned row_number window over "
        "customer plus a broadcast nation join (plan-verified) — one "
        "customer shuffle total, NOT |nation| subquery executions; "
        "DuckDB runs the identical SQL text as the oracle. The "
        "lateral-join spelling of the category_top2_products shape.",
)
def sql_lateral_top2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(f"""
        SELECT n.n_name AS nation, c.customer, c.acctbal
        FROM {_P}nation n,
        LATERAL (
            SELECT c_name AS customer, CAST(c_acctbal AS DOUBLE) AS acctbal
            FROM {_P}customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) c
    """)
