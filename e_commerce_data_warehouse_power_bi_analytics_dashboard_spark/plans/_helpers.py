"""Shared expression helpers for catalog queries (both dialects)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: str | Column) -> Column:
    """SUM of a DECIMAL money column, rounded to 2, surfaced as DOUBLE.

    The sum itself is exact (decimal), so the terminal double cast is
    deterministic regardless of partitioning/aggregation order.
    """
    return F.round(F.sum(col), 2).cast("double")


def money_sum0(col: str | Column) -> Column:
    """COALESCE(SUM(money),0) null-safe variant (SURVEY A12)."""
    return F.round(F.coalesce(F.sum(col), F.lit(0)), 2).cast("double")


def int_sum(col: str | Column) -> Column:
    return F.sum(col).cast("long")


def avg2(col: str | Column) -> Column:
    """AVG(money) as DOUBLE, computed as exact-decimal-sum / count.

    The raw IEEE quotient is bit-identical across engines; rounding it
    is NOT (engines implement round(double) differently at half-way
    boundaries), so quotients are surfaced unrounded. Same rule applies
    to every ratio measure (ARPO/ARPC/...).
    """
    return F.sum(col).cast("double") / F.count(col)


def iso_date(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def month_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM")


# DuckDB-dialect twins (kept next to the Spark ones so drift is visible)
def o_money_sum(expr: str) -> str:
    return f"CAST(ROUND(SUM({expr}), 2) AS DOUBLE)"


def o_money_sum0(expr: str) -> str:
    return f"CAST(ROUND(COALESCE(SUM({expr}), 0), 2) AS DOUBLE)"


def o_int_sum(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"


def o_avg2(expr: str) -> str:
    return f"(CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}))"
