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
from pyspark.sql import functions as F

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


@register(
    "sql_range_interval_window",
    oracle="""
        WITH daily AS (
            SELECT n_name AS country, CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS rev_dec
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        )
        SELECT country, strftime(day, '%Y-%m-%d') AS day,
               CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue,
               CAST(ROUND(SUM(rev_dec) OVER (
                   PARTITION BY country ORDER BY day
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS trailing_7d
        FROM daily
    """,
    tags=("sql", "window", "W4", "F14"),
    doc="TIME-VALUED window frame: trailing-7-day revenue per country "
        "via RANGE BETWEEN INTERVAL 6 DAY PRECEDING — the frame is "
        "defined on the ORDER-BY date VALUES, so calendar gaps are "
        "handled by the frame itself (no date-spine densification, the "
        "declarative alternative to ts_gapfill + ROWS frames; a "
        "sparse-day country still gets the correct 7-day trailing "
        "sum). Country-partitioned (never a global window); the daily "
        "pre-aggregate bounds each partition at calendar cardinality. "
        "All sums are exact DECIMAL with terminal ROUND-to-DOUBLE "
        "(_helpers discipline).",
)
def sql_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(f"""
        WITH daily AS (
            SELECT n_name AS country, CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS rev_dec
            FROM {_P}orders
            JOIN {_P}customer ON o_custkey = c_custkey
            JOIN {_P}nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        )
        SELECT country, date_format(day, 'yyyy-MM-dd') AS day,
               CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue,
               CAST(ROUND(SUM(rev_dec) OVER (
                   PARTITION BY country ORDER BY day
                   RANGE BETWEEN INTERVAL '6' DAY PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS trailing_7d
        FROM daily
    """)


#: Python UDTF chunker: 25-token chunks, emitted one row per chunk.
#: Deterministic pure function of its argument (retry/speculation safe).
_UDTF_CHUNK = 25


def _chunker_udtf():
    """Build the UDTF class lazily (decorator needs an active session on
    some codepaths; keeps import of this module Spark-free)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_md5 string")
    class ChunkDoc:
        def eval(self, text: str):
            import hashlib

            toks = [w for w in (text or "").split(" ") if w]
            for i in range(0, max(len(toks), 1), _UDTF_CHUNK):
                piece = " ".join(toks[i : i + _UDTF_CHUNK])
                yield (
                    i // _UDTF_CHUNK,
                    len(toks[i : i + _UDTF_CHUNK]),
                    hashlib.md5(piece.encode()).hexdigest(),
                )

    return ChunkDoc


@register(
    "sql_python_udtf_chunks",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> w <> '') AS t
            FROM documents
        )
        SELECT doc_id,
               CAST((i - 1) / {_UDTF_CHUNK} AS INT) AS chunk_idx,
               CAST(len(t[i:i+{_UDTF_CHUNK - 1}]) AS INT) AS n_tokens,
               md5(array_to_string(t[i:i+{_UDTF_CHUNK - 1}], ' ')) AS chunk_md5
        FROM toks, unnest(range(1, greatest(len(t), 1) + 1, {_UDTF_CHUNK})) AS u(i)
    """,
    tags=("sql", "udtf", "python", "llm"),
    doc="Python UDTF + LATERAL correlated table function (Spark 4 "
        "pyspark.sql.functions.udtf): a user-defined table function "
        f"chunks each document into {_UDTF_CHUNK}-token pieces, invoked "
        "as `FROM docs, LATERAL chunk_doc(text)` — the table-function "
        "extension API the DSL entries don't exercise (completing the "
        "scalar-UDF / UDAF / UDTF triad with curation's mapInPandas). "
        "The UDTF is a deterministic pure function of its argument, so "
        "retries/speculative tasks are safe and the declarative DuckDB "
        "twin reproduces it exactly. Scale: runs inside the scan stage "
        "per-partition (one Python boundary, no shuffle introduced); "
        "for bulk chunking prefer the zero-boundary JVM spelling "
        "(curation_doc_chunks) — this entry exists to pin the API "
        "surface.",
)
def sql_python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(_P + "documents")
    spark.udtf.register("chunk_doc", _chunker_udtf())
    return spark.sql(f"""
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5
        FROM {_P}documents d, LATERAL chunk_doc(d.text) c
    """)


@register(
    "setop_intersect_repeat_buyers",
    oracle="""
        SELECT o_custkey AS custkey
        FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("sql", "setop", "U1"),
    doc="INTERSECT (r10 — completes the relational set-operator family "
        "beyond the reference's UNION pair, E:213-214): customers who "
        "ordered in BOTH 1996 and 1997. Spark plans distinct + "
        "left-semi join — two map-side-pruned scans of the same "
        "parquet, one shuffle per side on the key, no data movement "
        "beyond the distinct key sets; at 100 TB both sides partial-"
        "aggregate before the exchange.",
)
def setop_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97)


@register(
    "setop_except_churned_buyers",
    oracle="""
        SELECT o_custkey AS custkey
        FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("sql", "setop", "J7"),
    doc="EXCEPT (set difference): customers who ordered in 1996 but "
        "not in 1997 — the churn cohort as one relational operator. "
        "Spark plans distinct + left-anti join (the same reject-"
        "detection shape as staging_rejects' anti-join, J7, stated "
        "set-algebraically); cost is two distinct key sets, never a "
        "row-level comparison.",
)
def setop_except_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.subtract(y97)


@register(
    "setop_except_all_excess_orders",
    oracle="""
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS excess_orders
        FROM (
            SELECT o_custkey AS custkey
            FROM orders WHERE year(o_orderdate) = 1996
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        ) GROUP BY custkey
    """,
    tags=("sql", "setop", "U2"),
    doc="EXCEPT ALL (multiset difference): per customer, how many MORE "
        "orders they placed in 1996 than 1997 — bag semantics preserve "
        "multiplicity where EXCEPT would collapse it (the ALL twin of "
        "the reference's UNION ALL, U2). Spark implements it as "
        "per-key count difference with row regeneration; the entry "
        "aggregates the surviving multiset to (custkey, excess) so the "
        "hash pins the multiplicities exactly.",
)
def setop_except_all_excess_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        y96.exceptAll(y97)
        .groupBy("custkey")
        .agg(F.count("*").cast("long").alias("excess_orders"))
    )


@register(
    "setop_intersect_all_common_slots",
    oracle="""
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS common_orders
        FROM (
            SELECT o_custkey AS custkey
            FROM orders WHERE year(o_orderdate) = 1996
            INTERSECT ALL
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        ) GROUP BY custkey
    """,
    tags=("sql", "setop", "U2"),
    doc="INTERSECT ALL (multiset intersection): per repeat customer, "
        "MIN(orders in 1996, orders in 1997) — the per-key minimum "
        "multiplicity bag semantics define. Aggregated to (custkey, "
        "common_orders) for an exact multiplicity-pinning hash; with "
        "setop_intersect/except[_all] this completes the six-operator "
        "relational set algebra (UNION [ALL] live in the cleaning "
        "pipeline's date-domain merge, U1/U2).",
)
def setop_intersect_all_common_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        y96.intersectAll(y97)
        .groupBy("custkey")
        .agg(F.count("*").cast("long").alias("common_orders"))
    )
