"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line {"metric", "value", "unit", "queries", "load_sec",
"worst_baseline_ratio", "sf"} sized to fit the driver's tail-capture
window; the full per-query detail (p50/p95 from the per-rep samples,
baseline ratios, cache policy) is written to BENCH_DETAIL.json.

Each query is fully materialized executor-side via the noop sink (no
driver collect — measures the distributed plan, not result transfer).
The headline set spans the engine's main plan shapes: star joins + hash
aggregation (OLAP), pre-aggregation (MOLAP), forced join algorithms,
semantic measures, differential validation, the full cleaning/staging
pipeline, LLM-data ops (exact + MinHash-LSH dedup, ANN top-k, text
quality), and event sessionization.

Comparable reference numbers live in BASELINE.md (single-node PostgreSQL
on 531k fact rows ≈ sf0.1's ~600k lineitem rows).

Cache policy (what is warm and what is not):
  - SESSION ARTIFACTS — the conformed star tables, the cleaned staging
    frames, the document shingle set, and the join-study date bound —
    model the reference's LOADED warehouse (its published numbers are
    EXPLAIN ANALYZE against loaded, buffer-warm tables; its staging
    schema and indexes are built once, outside the timed queries).
    These are built and materialized in the load phase, reported as
    ``load_sec``, and stay warm across timed reps.
  - QUERY-INTERNAL caches — any ``persist()`` a catalog plan creates
    for its own execution (e.g. the skew profiler's per-key counts,
    the time-series daily frame, RFM's customer grain) — are EVICTED
    before every timed rep, so each rep re-executes the full physical
    plan including those stages. Mechanism: persistent-RDD ids are
    snapshotted before each entry's warm-up; ids that appear during
    warm-up are the entry's own caches and are dropped per rep.
    Entries that had internal caches evicted are listed in the output
    under ``cache_policy.internal_caches_evicted``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import statistics

import plan_audit as plan_audit_mod

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.session import (
    DEFAULT_SF_DIR,
    get_spark,
)

#: reference timings (seconds) for the directly comparable queries —
#: BASELINE.md (single-node PostgreSQL, 531k fact rows ≈ sf0.1). Emitted
#: as per-query ratios in the bench JSON so round-over-round regressions
#: are machine-readable. Where BASELINE.md publishes before/after index
#: numbers, the AFTER (best published config) is used — except the
#: seq-scan row, whose BEFORE value IS the full-scan being reproduced.
BASELINE_REF_SEC = {
    "olap_monthly_revenue_by_country": 1.200,    # DSS aggregate
    "join_study_broadcast_hash": 0.355,          # hash join
    "join_study_sort_merge": 0.665,              # sort-merge join
    "layout_partition_pruned_revenue": 0.128,    # pruned range query
    "range_filter_sum": 0.103,                   # B-tree on date_key, after
    "category_dummy_sales": 0.752,               # bitmap-ish category agg, after
    "point_lookup_customer": 0.122,              # PK lookup customer_key=5000, after
    "secondary_lookup_customername": 0.110,      # secondary index on customername, after
    "composite_filter_sum": 0.122,               # composite (product_key, date_key), after
    "layout_mv_refresh_roundtrip": 0.105,        # MV read-back (refresh paid at plan build)
    "seqscan_sum_total": 0.414,                  # sequential-scan baseline (before — it IS the scan)
    # join_study_nested_loop (ref 0.342s) is intentionally absent: the
    # reference's number is an INDEXED nested loop (B-tree probe per
    # row); Spark's analog of that probe pattern is the broadcast-hash
    # entry above, while BroadcastNestedLoopJoin is a forced-degradation
    # study (correctness-checked in the catalog, not a headline ratio).
    # The OLTP invoice lookup (ref ~15ms) is likewise absent: a single
    # indexed-row probe is not a distributed-engine workload — Spark's
    # per-query floor (task launch + noop commit) exceeds the entire
    # reference budget regardless of plan quality; the PK-lookup row
    # above (0.122s) is the honest indexed-lookup comparison.
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
    # round-3 additions: the remaining BASELINE.md index-study rows
    "range_filter_sum",
    "category_dummy_sales",
    "point_lookup_customer",
    "secondary_lookup_customername",
    "composite_filter_sum",
    "layout_mv_refresh_roundtrip",
    "seqscan_sum_total",
    # round-4 additions: the r3/r4 distributed-rank rewrites (never
    # benchmarked before), the list-partition pruned read, and the
    # stream-stream interval-join batch twin
    "sample_training_order",
    "pareto_product_abc",
    "layout_list_partition_pruned",
    "events_view_purchase_pairs",
    # round-5 additions: real PNG pixel decode (Arrow/mapInPandas path),
    # BM25 retrieval, SemDeDup cluster dedup, AQE-skew join demo
    "mm_png_pixel_decode",
    "bm25_topk_search",
    "semdedup_cluster_keep",
    "skew_aqe_join_agg",
    # round-5b additions: the distributed-ntile decomposition, the
    # single-agg association-rule replan, the grouped-UDAF pandas path,
    # both iterative trainers (k-means, fixed-point PageRank), and the
    # interval-join latency percentiles
    "window_customer_deciles",
    "basket_association_rules",
    "udaf_weighted_median_price",
    "kmeans_train_clusters",
    "pagerank_copurchase",
    "events_conversion_latency",
    # round-5c additions: the canonical TPC-H shapes (full-scan
    # multi-aggregate + six-table snowflake) and the decorrelated
    # LATERAL top-k
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "sql_lateral_top2_customers",
    # round-6 additions: the decorrelated semi/anti TPC-H pair, the
    # PQ-ADC scan (iterative codebook fit), and the truecolor decode
    "tpch_q18_large_volume_customer",
    "tpch_q21_suppliers_kept_waiting",
    "ann_pq_adc_topk",
    "mm_png_rgb_decode",
    "bpe_train_merges",
    # round-6b additions: the logistic-regression quality-classifier
    # trainer (iterative, 65-cell gradient shuffle) and the word-entropy
    # curation signal (explode-grain text agg)
    "lr_train_weights",
    "text_word_entropy",
    # round-6c additions: the combined IVF+PQ scan, the C4 line-dedup
    # shuffle, the CCNet perplexity buckets, DSIR importance weights,
    # the decorrelated scalar-subquery TPC-H shape, and degree-ordered
    # triangle counting
    "ann_ivfpq_topk",
    "curation_line_dedup",
    "text_unigram_perplexity",
    "sample_importance_dsir",
    "tpch_q17_small_quantity_revenue",
    "graph_triangle_count",
    "pca_power_iteration",
    "ts_ewma_daily_revenue",
    "lr_eval_auc",
    "dedup_minhash_estimate_audit",
    "tpch_q22_global_sales_opportunity",
    # round-6d additions: the suite-completing TPC-H snowflake (q9),
    # the exact-integer chi-squared drift detector, the KS prefix-sum
    # decomposition, and the window-as-as-of attribution shape
    "tpch_q9_product_type_profit",
    "drift_chi2_lang_source",
    "drift_ks_doclen_by_lang",
    "events_attribution_last_touch",
    # round-6e additions: the CDC snapshot+delta apply, the bigram-LM
    # scorer, rank-2 PCA, the rolling-distinct expansion, the Holt fold,
    # and the DFT tone classifier (Arrow+numpy path)
    "cdc_apply_customer_feed",
    "text_bigram_perplexity",
    "pca_top2_deflation",
    "events_rolling_7d_active_users",
    "ts_holt_linear_daily",
    "mm_wav_tone_detect",
    # round-6f additions: the chained carry-forward sequence match and
    # the HLL rolling-window merge
    "events_sequence_match",
    "sketch_rolling_distinct_users",
    # round-7 additions: the ANN train/serve split landed — the three
    # PQ entries are now pure scans over the persisted index (built in
    # the load phase, the reference's CREATE INDEX analog), so the
    # residual IVFADC scan joins the headline set at its honest serve
    # cost (r6 had excluded it for paying ~14 s of per-rep training).
    # The index-build (TRAIN) cost itself is paid once in load_sec on a
    # cold run; the manifest entry benched here is the serve-side
    # integrity scan over the persisted artifacts. Also new: the
    # incremental MinHash probe against the persisted corpus bands, the
    # rank-over-ROLLUP TPC-DS shape, and the 16-bit PNG decode.
    "ann_ivfpq_residual_topk",
    "ann_index_build_manifest",
    "dedup_incremental_minhash",
    "tpcds_q67_rollup_rank",
    "mm_png_gray16_decode",
    # round-7b additions: the DPP-pruned IVF list-file scan, the BM25
    # inverted-index serve path, and the two new index manifests
    "ann_ivfpq_partitioned_scan",
    "bm25_index_serve_topk",
    "minhash_index_manifest",
    "bm25_index_manifest",
    # round-7c additions: the MDM record-linkage pipeline (banded
    # blocking + composite-rank best match) and the Holt backtest
    # (train-prefix fold + holdout scoring in one calendar-grain frame)
    "er_customer_linkage",
    "ts_backtest_holt_daily",
    # round-8 additions: the table-format serve paths (snapshot read =
    # manifest fold + active-file scan; time travel = three historical
    # folds — the build itself, create + 2 COW merges, is in load_sec
    # with the other index TRAIN jobs) and the Adam7-interlaced PNG
    # decode (7-pass scatter in the Arrow/mapInPandas path)
    "tf_merge_snapshot",
    "tf_time_travel_versions",
    "mm_png_interlaced_decode",
    # the stats-driven join (ANALYZE lifecycle; the managed-table build
    # + ANALYZE is in load_sec), the 24-bit PCM and G.711 mu-law
    # decodes, and the evolved-append merge_schema snapshot
    "cbo_stats_filtered_dim_join",
    "mm_wav_pcm24_decode",
    "mm_wav_mulaw_decode",
    "mm_wav_float32_decode",
    "tf_append_schema_evolution",
    # round-9 additions: the table-format serve paths grown this round —
    # stats-pruned snapshot read (manifest data skipping), the partition
    # ledger, SQL time travel, the change data feed (touched-file diff),
    # and the sorted-compaction range skip — plus the new codecs: full
    # baseline JPEG pixel decode (4:4:4, 4:2:0, restart intervals),
    # G.711 A-law, and the N-channel WAV deinterleave
    "tf_stats_pruned_read",
    "tf_partitioned_merge",
    "tf_time_travel_sql",
    "tf_change_feed",
    "tf_sorted_range_skipping",
    "mm_jpeg_pixel_decode",
    "mm_jpeg_420_decode",
    "mm_jpeg_restart_decode",
    "mm_wav_alaw_decode",
    "mm_wav_multichannel_decode",
    # round-9b additions: merge-on-read DML serve paths (vectored
    # snapshot read = broadcast anti-join on (file, pos); update read;
    # CDF across MoR commits), 2-D Z-order file skipping, CHECK-
    # constraint re-validation, IMA ADPCM decode (adaptive state
    # machine in Arrow batches), and the ExactSubstr span extractor
    # (inverted-index-bounded diagonal runs)
    "tf_mor_delete_read",
    "tf_mor_update_read",
    "tf_mor_change_feed",
    "tf_zorder_skip",
    "tf_check_constraints",
    "mm_wav_adpcm_decode",
    "mm_wav_msadpcm_decode",
    "mm_wav_float64_decode",
    "dedup_substring_spans",
    # round-10 additions: the SQL-routed MERGE INTO build+read and the
    # progressive (SOF2 multi-scan) JPEG decode
    "tf_merge_sql",
    "mm_jpeg_progressive_decode",
]

#: FROZEN trend-line set (the r2-era 28) — never append here (r5 verdict
#: item #5: round-over-round totals must compare like-for-like while
#: HEADLINE keeps growing). Emitted as ``core_total_wall`` in the stdout
#: metric line and archived per round in BENCH_r{N}.json.
CORE = (
    "olap_monthly_revenue_by_country", "olap_top10_products_last3m",
    "olap_cltv", "olap_cohort_first_purchase", "molap_month_country",
    "join_study_broadcast_hash", "join_study_sort_merge",
    "measures_kpi_row", "measure_yoy_growth", "validation_kpi_summary",
    "measure_cumulative_revenue", "layout_partition_pruned_revenue",
    "mm_feature_extract", "staging_fact_build", "dedup_exact_documents",
    "dedup_minhash_lsh", "ann_cosine_topk", "text_quality_score",
    "events_sessionize", "rfm_customer_segments", "basket_product_pairs",
    "mv_incremental_refresh", "ts_anomaly_zscore_daily",
    "scd2_asof_lineitem_price", "curation_decontam_overlap",
    "layout_zorder_skip", "dedup_incremental_new_batch",
    "dq_key_skew_profile",
)

#: SECOND frozen trend-line set (r10 — verdict #3: no table-format or
#: r9b entry was wall-clock-tracked in the driver-archived compact
#: line, so a regression in e.g. the MoR read's broadcast anti-join
#: would be invisible round-over-round). Six representatives of the
#: families that joined HEADLINE after the r2 core froze; their r10
#: medians are the pinned baseline. Emitted as ``core_r10_total_wall``
#: and included in the compact per-query map. Never append here —
#: extend HEADLINE instead.
CORE_R10 = (
    "tf_merge_snapshot",      # COW MERGE build + snapshot read
    "tf_mor_delete_read",     # vectored snapshot (broadcast anti-join)
    "tf_stats_pruned_read",   # manifest data skipping
    "tf_change_feed",         # touched-file CDF diff
    "mm_jpeg_pixel_decode",   # baseline JPEG entropy decode path
    "dedup_substring_spans",  # ExactSubstr diagonal-run extraction
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def evict_rdds(spark, ids: set[int]) -> None:
    """Drop the cached blocks of the given persistent-RDD ids (blocking).
    The plans keep their persist marking, so the next execution rebuilds
    the cache — i.e. pays the full stage again."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(True)


def machine_load() -> dict:
    """Contention marker (r8 advisory #2 / verdict #6): 1/5/15-min
    loadavg + running-process count at sample time, recorded at bench
    start AND end so a future reader can separate machine contention
    from code regression without a quiet-machine rerun. Reading:
    load1 >> cpu count at either edge means the round-end window was
    contended and the totals are upper bounds (r7's +36% "drift" was
    exactly this — see the A/B note below in main())."""
    la = os.getloadavg()
    try:
        nproc = sum(1 for d in os.listdir("/proc") if d.isdigit())
    except OSError:
        nproc = -1
    return {
        "load1": round(la[0], 2), "load5": round(la[1], 2),
        "load15": round(la[2], 2), "procs": nproc,
        "cpus": os.cpu_count(),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # wait-for-quiet (r12 — verdict #4): two rounds of driver benches
    # started contended; spend a bounded budget waiting for the load to
    # settle before sampling (the contended tag below remains the
    # guarantee if the budget expires busy)
    from harness_util import git_head, wait_for_quiet

    waited_quiet = wait_for_quiet()
    load_at_start = machine_load()
    # contention guard (r11 — verdict #7): a bench started on a busy
    # machine inflates EVERY query uniformly (r10's driver run read
    # ~1.3x over the quiet freeze at load1 2.45); tag the artifact so
    # trend gates compare like with like instead of reading contention
    # as regression
    # threshold is deliberately ABSOLUTE, not CPU-scaled: the r10
    # evidence was load1 2.45 on this 32-thread box inflating every
    # query ~1.3x uniformly — the contention that poisons these numbers
    # is JVM/memory-bandwidth interference from a handful of busy
    # processes, which core count does not absorb
    contended = load_at_start["load1"] > 1.5
    if contended:
        print(
            f"WARNING: bench starting contended (load1="
            f"{load_at_start['load1']}) — artifact will be tagged "
            f"contended:true; timings are upper bounds",
            file=sys.stderr, flush=True,
        )

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

    # Warehouse load (timed separately as load_sec): build and
    # materialize every SESSION ARTIFACT the timed queries read —
    # exactly as the reference loads its DW + staging schema before any
    # query is benchmarked (its published numbers are query-only against
    # loaded tables — BASELINE.md). Anything cached lazily AFTER this
    # point is query-internal and gets evicted per timed rep.
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.cleaning_queries import (
        _products_clean,
        _sales_clean,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.joinstudy import (
        _min_date_bound,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.llm_ops import (
        _doc_shingles,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.text_mining import (
        tokenized_docs,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.star import (
        StarSchema,
    )

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        ann_index as _ann_ix,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        minhash_index as _mh_ix,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        text_index as _tx_ix,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import (
        cbo_queries as _cbo_q,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import (
        table_format_queries as _tf_q,
    )

    # Index TRAINING runs first (the reference's CREATE INDEX analog),
    # then its session debris is dropped BEFORE the warm artifacts are
    # cached. Context: r7's core-28 read +36% (16.2 -> 22.1 s) in the
    # driver's round-end run. r8's controlled A/B on a QUIET machine
    # cleared the code: fresh in-session builds -> core 16.06 s
    # (BENCH_r06 line: 16.23 s), so the r7 number was machine
    # contention during the round-end window, not build contamination.
    # r9 re-confirmed the pattern on the only >10% r7->r8 regression
    # (basket_product_pairs 1.59 -> 1.90 s with zero code change): a
    # quiet-machine 15-rep rerun read 1.43 s median. The machine_load
    # marker below makes this diagnosis machine-readable per round.
    # The hygiene below is kept as cheap insurance anyway: training
    # leaves eagerly localCheckpoint-ed RDD blocks whose driver refs
    # are gone but whose JVM blocks linger until a GC lets
    # ContextCleaner reap them — evict every persistent RDD the builds
    # created and force one full GC, so the timed phase starts from the
    # same memory state whether the index was built or reused. Build
    # cost itself stays honestly inside load_sec.
    index_builds = {
        # the persisted ANN index (coarse centroids, bucket assignment,
        # raw+residual PQ codebooks/codes): trained ONCE here so the
        # five ANN serve entries measure pure query-time scans.
        # Idempotent: a completed index from a prior run is reused (its
        # build cost then shows in neither load_sec nor the queries,
        # like a pre-existing index).
        "ann_index": lambda: _ann_ix.build_ann_index(spark, sf_dir),
        # the corpus MinHash band/signature index (same lifecycle: what
        # a real ingest pipeline stamps at document write time)
        "minhash_index": lambda: _mh_ix.build_minhash_index(spark, sf_dir),
        # the BM25 inverted index (postings/term_stats/stats)
        "bm25_index": lambda: _tx_ix.build_bm25_index(spark, sf_dir),
        # the versioned-manifest tables (create + 2 COW merges; the
        # schema-evolution twin's create + evolved append)
        "table_format": lambda: _tf_q.ensure_demo_table(spark, sf_dir),
        "table_format_evo": lambda: _tf_q.ensure_evo_table(spark, sf_dir),
        # r9: the sorted-compaction demo table (create + OPTIMIZE
        # sort_by — the tf_sorted_range_skipping serve path's build)
        "table_format_sorted": lambda: _tf_q.ensure_sorted_table(spark, sf_dir),
        # r9b: the merge-on-read demo tables (create + vector deletes +
        # compact; create + MoR update), the z-ordered table (create +
        # OPTIMIZE ZORDER), and the constrained table (validated create
        # + constrained append)
        "table_format_mor": lambda: _tf_q.ensure_mor_table(spark, sf_dir),
        "table_format_upd": lambda: _tf_q.ensure_upd_table(spark, sf_dir),
        "table_format_zorder": lambda: _tf_q.ensure_zorder_table(spark, sf_dir),
        "table_format_chk": lambda: _tf_q.ensure_chk_table(spark, sf_dir),
        # the ANALYZEd catalog tables (saveAsTable + COMPUTE STATISTICS
        # — the reference's scheduled ANALYZE maintenance job)
        "cbo_stats": lambda: _cbo_q.ensure_stats_tables(spark, sf_dir),
    }
    session_artifacts = {
        "star_tables": lambda: [
            materialize(t)
            for t in (star.dim_customer, star.dim_product, star.dim_date, star.fact_sales)
        ],
        "staging_clean_frames": lambda: [
            materialize(_products_clean(spark, sf_dir)),
            materialize(_sales_clean(spark, sf_dir)),
        ],
        "document_shingles": lambda: materialize(_doc_shingles(spark, sf_dir)),
        "tokenized_documents": lambda: materialize(tokenized_docs(spark, sf_dir)),
        "joinstudy_date_bound": lambda: materialize(_min_date_bound(spark, sf_dir)),
    }
    t0 = time.perf_counter()
    pre_build_ids = persistent_rdd_ids(spark)
    for build in index_builds.values():
        build()
    evict_rdds(spark, persistent_rdd_ids(spark) - pre_build_ids)
    spark.sparkContext._jvm.System.gc()
    star = StarSchema(spark, sf_dir)
    for build in session_artifacts.values():
        build()
    load_sec = round(time.perf_counter() - t0, 3)

    # Timing methodology (matched to the reference's EXPLAIN ANALYZE
    # convention, whose published numbers are EXECUTION time on a warm
    # buffer cache, excluding parse/plan):
    #   1. logical-plan construction (catalog fn -> DataFrame) is
    #      untimed — the analog of SQL parse+plan (for the layout
    #      entries this also covers the one-off layout/MV write, the
    #      analog of CREATE INDEX / REFRESH MV outside EXPLAIN ANALYZE);
    #   2. one untimed warm-up execution pays JIT/codegen and builds the
    #      entry's internal caches, whose persistent-RDD ids are diffed
    #      against the pre-warm-up snapshot;
    #   3. median of n>=3 timed executions of the FULL physical plan:
    #      internal caches are evicted before each rep, so every
    #      scan/shuffle/broadcast outside the declared session
    #      artifacts re-runs per rep; only result transfer is elided
    #      via the noop sink.
    #   4. ITERATIVE entries (tag 'iterative': k-means, PageRank) are
    #      rebuilt fn()+materialize per rep — their driver-side
    #      iteration loop IS the workload, and eager-checkpoint state
    #      cannot be re-materialized after eviction by design.
    reps = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    # sub-second queries are dominated by scheduler/GC jitter at these
    # timescales (an 0.1s query swings ±40% rep-to-rep); give them more
    # reps so the reported median converges — still a median of full
    # uncached executions, just a larger honest sample
    micro_cutoff = 0.3
    micro_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_MICRO_REPS", "15")))
    timings: dict[str, float] = {}
    percentiles: dict[str, dict[str, float]] = {}
    samples_taken: dict[str, int] = {}
    evicted: list[str] = []
    # audit-only mode: skip the timed reps and regenerate ONLY the
    # executed-plan audit (PLAN_AUDIT_EXEC.json) — for iterating on the
    # plan gates without paying the ~25-min timing run
    audit_only = os.environ.get("SPARK_GRAFT_BENCH_AUDIT_ONLY") == "1"
    for name in (HEADLINE if not audit_only else []):
        base_ids = persistent_rdd_ids(spark)
        # ITERATIVE entries (k-means, PageRank) run eager localCheckpoint
        # jobs during plan CONSTRUCTION — their checkpointed RDDs cannot
        # be rebuilt after eviction (lineage truncated by design), and
        # the driver-side iteration loop IS the workload. For those the
        # timed rep is the full fn()+materialize rebuild; for everything
        # else construction stays untimed (the parse/plan analog).
        rebuild = "iterative" in catalog[name].tags
        df = catalog[name].fn(spark, sf_dir)
        materialize(df)  # warm-up; builds any internal caches
        samples = []
        saw_internal: set[int] = set()
        target = reps
        while len(samples) < target:
            # NB: the first eviction clears the buffer RDD's storage
            # level for good (it never re-registers), so reps 2..n
            # recompute the full stage uncached — accumulate the ids
            # seen across reps for the report, not just the last rep's
            internal = persistent_rdd_ids(spark) - base_ids
            saw_internal |= internal
            evict_rdds(spark, internal)
            t0 = time.perf_counter()
            if rebuild:
                df = catalog[name].fn(spark, sf_dir)
            materialize(df)
            samples.append(time.perf_counter() - t0)
            if len(samples) == reps and (
                statistics.median(samples) < micro_cutoff
                or name in BASELINE_REF_SEC
            ):
                # micro-queries AND every baseline-compared query get the
                # larger sample: the published ratios are medians, and a
                # 0.7s forced-join's 5-rep median still swings ~±20%
                # run-to-run (r6 observed 1.07..1.37 on the same code) —
                # the bigger honest sample stabilizes the trend line
                target = micro_reps
        leftover = persistent_rdd_ids(spark) - base_ids
        if saw_internal or leftover:
            evicted.append(name)
            evict_rdds(spark, leftover)
        timings[name] = round(statistics.median(samples), 3)
        srt = sorted(samples)
        percentiles[name] = {
            "p50": timings[name],
            # nearest-rank p95 over the honest per-rep sample (5 or 15)
            "p95": round(srt[max(0, -(-95 * len(srt) // 100) - 1)], 3),
        }
        samples_taken[name] = len(samples)

    # EXECUTED-plan audit at the bench scale (r7 verdict #9; widened to
    # the FULL catalog in r9 per verdict #4): the per-entry PLAN_AUDIT
    # profiles analyzed plans at sf0.001, where AQE decisions (skew
    # splits, broadcast demotions, partition coalescing) never
    # materialize. Here EVERY catalog entry is executed ONCE (untimed,
    # driver-side toLocalIterator so the heap never holds a full
    # result) and the FINAL adaptive plan is profiled — so AQE
    # demotions at scale are visible for the long tail too, not just
    # the headline set. Written to PLAN_AUDIT_EXEC.json; plan_audit.py
    # merges it into PLAN_AUDIT.md; tests/test_artifacts.py gates
    # completeness + cartesian=0 + the Python-boundary allowlist.
    exec_audit: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_EXEC_AUDIT", "1") == "1":
        exec_patterns = {
            "hash_ex": re.compile(r"Exchange hashpartitioning"),
            "range_ex": re.compile(r"Exchange rangepartitioning"),
            "single_ex": re.compile(r"Exchange SinglePartition"),
            "bcast": re.compile(r"BroadcastExchange"),
            "windows": re.compile(r"\bWindow(?:Exec|\b)"),
            "py": re.compile(
                r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
                r"BatchEvalPython|PythonMapInArrow"
            ),
            "cartesian": re.compile(r"CartesianProduct"),
            "aqe_shuffle_reads": re.compile(r"AQEShuffleRead"),
            "skew_joins": re.compile(r"skew=true"),
            "codegen_spans": re.compile(r"WholeStageCodegen"),
        }
        for name in sorted(catalog):
            base_ids = persistent_rdd_ids(spark)
            try:
                df = catalog[name].fn(spark, sf_dir)
                for _ in df.toLocalIterator():
                    pass
                plan = df._jdf.queryExecution().executedPlan().toString()
                exec_audit[name] = {
                    k: len(p.findall(plan)) for k, p in exec_patterns.items()
                }
                exec_audit[name]["aqe_final"] = "isFinalPlan=true" in plan
                # SinglePartition exchanges whose child is NOT a scalar
                # aggregate — data funnels. Gated per-entry by
                # tests/test_artifacts.py (r9 verdict #2: the analyzed-
                # plan guard can't see an AQE demotion to a funnel).
                exec_audit[name]["single_ex_nonscalar"] = (
                    plan_audit_mod.nonscalar_single_ex(plan)
                )
            except Exception as e:  # noqa: BLE001 — audit records, never dies
                exec_audit[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
            evict_rdds(spark, persistent_rdd_ids(spark) - base_ids)
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "PLAN_AUDIT_EXEC.json"), "w"
        ) as f:
            from harness_util import git_head as _gh

            json.dump({"sf_dir": sf_dir, "mode": "executed(final AQE)",
                       "git_head": _gh(),
                       "entries": exec_audit}, f, indent=1, sort_keys=True)
    if audit_only:
        print(json.dumps({
            "metric": "exec_plan_audit_only", "entries": len(exec_audit),
            "errs": sum(1 for v in exec_audit.values() if "err" in v),
            "sf_dir": sf_dir,
        }, separators=(",", ":")))
        spark.stop()
        return

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
    core_total = round(sum(timings[n] for n in CORE if n in timings), 3)
    core_r10_total = round(
        sum(timings[n] for n in CORE_R10 if n in timings), 3
    )
    worst = max((b["ratio"] for b in baseline.values()), default=None)

    # Full detail → file (r4 verdict #1/#7: the one-line stdout contract
    # had outgrown the driver's 2000-char tail capture, so the round's
    # perf proof was machine-invisible). Everything an auditor wants —
    # per-query p50/p95 from the per-rep samples, baseline ratios, cache
    # policy — lives here; stdout carries only the compact contract line.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "git_head": git_head(),
                "waited_for_quiet_sec": waited_quiet,
                "core_total_wall": core_total,
                "core_r10_total_wall": core_r10_total,
                "core_r10_set": list(CORE_R10),
                "core_set": list(CORE),
                "queries": timings,
                "percentiles": percentiles,
                "load_sec": load_sec,
                "reps": reps,
                # per-query sample counts where the adaptive micro-rep
                # extension kicked in (everything absent here ran `reps`)
                "extended_reps": {
                    n: k for n, k in samples_taken.items() if k != reps
                },
                "baseline_vs_ref": baseline,
                "worst_baseline_ratio": worst,
                "cache_policy": {
                    "session_artifacts_in_load_sec": sorted(session_artifacts),
                    "internal_caches_evicted": evicted,
                },
                "machine_load": {
                    "start": load_at_start, "end": machine_load(),
                },
                "contended": contended,
                "sf": sf,
            },
            f,
            indent=1,
        )

    # ONE compact final line for the driver (must fit its ~2000-char tail
    # window WITH margin for trailing runtime noise): metric + totals +
    # per-query medians for the FROZEN core set and every baseline-
    # compared query (the trend line and the ratio evidence); the full
    # growing headline set lives in BENCH_DETAIL.json. If even that
    # subset ever outgrows the budget, it falls back to the detail file
    # rather than silently truncating the JSON.
    compact_queries = {
        n: t for n, t in timings.items()
        if n in CORE or n in CORE_R10 or n in BASELINE_REF_SEC
    }
    load_at_end = machine_load()
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "core_total_wall": core_total,
        "core_r10_total_wall": core_r10_total,
        "queries": compact_queries,
        "load_sec": load_sec,
        "worst_baseline_ratio": worst,
        # contention marker: 1-min loadavg at bench start/end (full
        # sample incl. process counts in BENCH_DETAIL.json) — read a
        # high value as "totals are contended upper bounds"
        "load1_start_end": [load_at_start["load1"], load_at_end["load1"]],
        "contended": contended,
        "detail": "BENCH_DETAIL.json",
        "sf": sf,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact["queries"] = {"_see": "BENCH_DETAIL.json"}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
