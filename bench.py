"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized executor-side via the noop sink (no
driver collect — measures the distributed plan, not result transfer).
The headline set spans the engine's main plan shapes: star joins + hash
aggregation (OLAP), pre-aggregation (MOLAP), forced join algorithms,
semantic measures, differential validation, the full cleaning/staging
pipeline, LLM-data ops (exact + MinHash-LSH dedup, ANN top-k, text
quality), and event sessionization.

Comparable reference numbers live in BASELINE.md (single-node PostgreSQL
on 531k fact rows ≈ sf0.1's ~600k lineitem rows).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.session import (
    DEFAULT_SF_DIR,
    get_spark,
)

HEADLINE = [
    # OLAP star joins / aggregation (reference Iteration 2 OLAP.sql)
    "olap_monthly_revenue_by_country",
    "olap_top10_products_last3m",
    "olap_cltv",
    "olap_cohort_first_purchase",
    # MOLAP pre-aggregation (MOLAP.sql)
    "molap_month_country",
    # forced join algorithms (JoinPerformance.sql)
    "join_study_broadcast_hash",
    "join_study_sort_merge",
    # semantic measure layer (DAX iterations)
    "measures_kpi_row",
    "measure_yoy_growth",
    # ETL-vs-ELT differential validation (ELT.sql D1-D10)
    "validation_kpi_summary",
    # cumulative-revenue window (DAX time intelligence)
    "measure_cumulative_revenue",
    # physical layout: partitioned write + pruned read round-trip
    "layout_partition_pruned_revenue",
    # multimodal: Arrow-batched binary feature extraction
    "mm_feature_extract",
    # full cleaning/staging pipeline end-to-end (ETL.sql)
    "staging_fact_build",
    # LLM-data-pipeline operators (beyond-reference north star)
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    # event-stream batch analytics
    "events_sessionize",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="ecdw-bench")
    catalog = get_catalog()

    # JVM/codegen warm-up (untimed): run the flagship star-join query at
    # the smallest SF so the parquet reader, broadcast-join, hash-agg and
    # sort codegen paths are JIT-compiled before the measured set
    materialize(catalog["olap_monthly_revenue_by_country"].fn(spark, "/root/testdata/sf0.001"))
    materialize(spark.read.parquet(f"{sf_dir}/region.parquet"))

    # Warehouse load (timed separately as load_sec): materialize the
    # conformed star once, exactly as the reference loads its DW before
    # any query is benchmarked (its published numbers are query-only
    # against loaded tables — BASELINE.md)
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.star import (
        StarSchema,
    )

    t0 = time.perf_counter()
    star = StarSchema(spark, sf_dir)
    for tbl in (star.dim_customer, star.dim_product, star.dim_date, star.fact_sales):
        materialize(tbl)
    load_sec = round(time.perf_counter() - t0, 3)

    # best-of-2 per query: the first execution of each distinct plan
    # shape pays one-off JIT/codegen cost and this host shows multi-second
    # scheduling noise; the min is the reproducible steady-state number
    # (same convention as the reference's repeated EXPLAIN ANALYZE runs)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(catalog[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "load_sec": load_sec,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
