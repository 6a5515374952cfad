"""The query catalog — the engine's registered query/operator surface.

Every operator from SURVEY.md §2 that is oracle-able is registered here as
a named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (for
SQL-expressible ops) an equivalent DuckDB SQL string run against the same
parquet tables. ``__spark_entry__.py`` re-exports this registry as the
driver contract.

Output-type conventions (so the driver's order-insensitive value hash
matches across engines — see sources/star.py docstring):
  - money: DECIMAL arithmetic internally, terminal ``ROUND(...,2)`` then
    ``CAST AS DOUBLE``;
  - integer sums: ``CAST AS BIGINT`` (DuckDB sums INTEGER into HUGEINT);
  - dates/timestamps in outputs: ISO strings via date_format/strftime;
  - every computed column aliased identically in both dialects;
  - LIMIT queries carry a deterministic ORDER BY tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""  # reference citation (file:line)


CATALOG: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in CATALOG:
            raise ValueError(f"duplicate catalog entry {name!r}")
        CATALOG[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


_LOADED = False


def get_catalog() -> dict[str, Query]:
    """Import all query modules (side-effect: registration) and return the catalog."""
    global _LOADED
    if not _LOADED:
        from . import olap  # noqa: F401
        from . import molap  # noqa: F401
        from . import joinstudy  # noqa: F401
        from . import insights  # noqa: F401
        from . import measures_queries  # noqa: F401
        from . import validation  # noqa: F401
        from . import llm_ops  # noqa: F401
        from . import events_queries  # noqa: F401
        from . import cleaning_queries  # noqa: F401
        from . import multimodal_queries  # noqa: F401
        from . import layout  # noqa: F401
        from . import lifecycle_queries  # noqa: F401
        from . import rewrite  # noqa: F401
        from . import sampling  # noqa: F401
        from . import profiling  # noqa: F401
        from . import scd_queries  # noqa: F401
        from . import analytics  # noqa: F401
        from . import curation  # noqa: F401
        from . import timeseries  # noqa: F401
        from . import incremental  # noqa: F401
        from . import quality  # noqa: F401
        from . import text_mining  # noqa: F401
        from . import stats_queries  # noqa: F401
        from . import graph_queries  # noqa: F401
        from . import tpch_queries  # noqa: F401
        from . import tpcds_queries  # noqa: F401
        from . import sql_surfaces  # noqa: F401
        from . import classifier_queries  # noqa: F401
        from . import drift_queries  # noqa: F401
        from . import entity_resolution  # noqa: F401
        from . import table_format_queries  # noqa: F401
        from . import cbo_queries  # noqa: F401

        _LOADED = True
    return CATALOG
