"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.catalog``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (OLAP 1: monthly revenue by country) on sf0.001."""
    catalog = get_catalog()
    return catalog["olap_monthly_revenue_by_country"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in get_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in get_catalog().items() if q.oracle is not None}
