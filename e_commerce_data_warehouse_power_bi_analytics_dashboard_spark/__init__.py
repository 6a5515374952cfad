"""PySpark-native e-commerce analytics engine.

A from-scratch Spark implementation of the query and data-processing
capabilities of the reference project
``whozahm3d/E-Commerce-Data-Warehouse-Power-BI-Analytics-Dashboard``
(PostgreSQL + Power BI star-schema DW), re-expressed Spark-first:
declarative DataFrame plans, Parquet layout, Catalyst/AQE doing the
physical optimization the reference does by hand (indexes, manual
partitioning, materialized views).

Layers (mirrors SURVEY.md §7):
  - ``sources``   — raw readers, star-schema conformance, sinks
  - ``functions`` — scalar/text/vector expression helpers (no Python UDFs in hot paths)
  - ``operators`` — cleaning, dedup, similarity, measures, window ops
  - ``plans``     — the query catalog (+ DuckDB oracle twins), layout/physical helpers
  - ``streaming`` — Structured Streaming ingest over the events table
"""

from .session import get_spark

__all__ = ["get_spark"]
