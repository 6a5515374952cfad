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

import statistics

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.session import (
    DEFAULT_SF_DIR,
    get_spark,
)

#: reference timings (seconds) for the directly comparable queries —
#: BASELINE.md (single-node PostgreSQL, 531k fact rows ≈ sf0.1). Emitted
#: as per-query ratios in the bench JSON so round-over-round regressions
#: are machine-readable.
BASELINE_REF_SEC = {
    "olap_monthly_revenue_by_country": 1.200,  # DSS aggregate
    "join_study_broadcast_hash": 0.355,        # hash join
    "join_study_sort_merge": 0.665,            # sort-merge join
    # join_study_nested_loop (ref 0.342s) is intentionally absent: the
    # reference's number is an INDEXED nested loop (B-tree probe per
    # row); Spark's analog of that probe pattern is the broadcast-hash
    # entry above, while BroadcastNestedLoopJoin is a forced-degradation
    # study (correctness-checked in the catalog, not a headline ratio).
    "layout_partition_pruned_revenue": 0.128,  # pruned range query
}

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
    # round-2 additions: dashboard analytics, temporal, curation, layout
    "rfm_customer_segments",
    "basket_product_pairs",
    "mv_incremental_refresh",
    "ts_anomaly_zscore_daily",
    "scd2_asof_lineitem_price",
    "curation_decontam_overlap",
    "layout_zorder_skip",
    "dedup_incremental_new_batch",
    "dq_key_skew_profile",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # sf0.1 shuffle volumes are a few hundred MB at most: 8 initial
    # shuffle partitions (AQE coalesces further) beat the session
    # default of one-per-core on every headline query — measured in
    # round 2 (sp=8 vs 16 vs 32: sort_merge 0.74 / 0.90 / 1.40s,
    # minhash_lsh 1.8 / 2.8 / 3.1s). At larger SFs scale this up;
    # override with SPARK_GRAFT_BENCH_SHUFFLE.
    spark = get_spark(
        app_name="ecdw-bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
    )
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

    # Timing methodology (matched to the reference's EXPLAIN ANALYZE
    # convention, whose published numbers are EXECUTION time on a warm
    # buffer cache, excluding parse/plan):
    #   1. logical-plan construction (catalog fn -> DataFrame) is
    #      untimed — it is the analog of SQL parse+plan, a fixed
    #      driver-side cost independent of data volume;
    #   2. one untimed warm-up execution pays session-scoped one-offs
    #      (JIT/codegen, layout writes, staging persists — the
    #      reference pays these once too, outside its timed queries);
    #   3. median of n>=3 timed executions of the FULL physical plan
    #      (every scan/shuffle/broadcast re-runs per rep; only the
    #      result transfer is elided via the noop sink).
    reps = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = catalog[name].fn(spark, sf_dir)
        materialize(df)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(df)
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    baseline = {
        name: {
            "ref_sec": ref,
            "repo_sec": timings[name],
            "ratio": round(timings[name] / ref, 2),
        }
        for name, ref in BASELINE_REF_SEC.items()
        if name in timings
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "load_sec": load_sec,
                "reps": reps,
                "baseline_vs_ref": baseline,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
