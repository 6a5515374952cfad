"""Structured Streaming tests: stream results must equal the batch twins
(run with availableNow over the same parquet)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming import events as SE

from .conftest import SF_ORACLE

CATALOG = get_catalog()


def test_stream_hourly_equals_batch(spark):
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(SE.hourly_windows(stream), "t_hourly", spark, mode="update")
    got = {(r.window_start): (r.n_events, r.total_value) for r in out.collect()}
    batch = CATALOG["events_hourly_tumble"].fn(spark, SF_ORACLE).collect()
    want = {r.window_start: (r.n_events, r.total_value) for r in batch}
    assert got == want


def test_stream_dedup_ingest(spark):
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(SE.deduped_ingest(stream), "t_dedup", spark, mode="append")
    n = out.count()
    distinct_ids = out.select("event_id").distinct().count()
    assert n == distinct_ids > 0


def test_stream_sessionize_closed_sessions_match_batch(spark):
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(SE.sessionize_stream(stream), "t_sess", spark, mode="append")
    got = {
        (r.user_id, r.session_start.strftime("%Y-%m-%d %H:%M:%S")): (r.n_events, r.total_value)
        for r in out.collect()
    }
    batch = CATALOG["events_sessionize"].fn(spark, SF_ORACLE).collect()
    want = {(r.user_id, r.session_start): (r.n_events, round(r.session_value, 2)) for r in batch}
    # the stream emits only sessions closed before end-of-input (open
    # sessions at the tail are still in state when availableNow drains) —
    # every emitted session must match its batch twin, and most sessions
    # must have been emitted
    assert set(got) <= set(want)
    assert len(got) >= 0.8 * len(want)
    mismatches = {k: (got[k], want[k]) for k in got if got[k][0] != want[k][0]}
    assert not mismatches


def test_stream_session_window_builtin_matches_batch(spark):
    """The built-in session_window stream (append mode) must emit only
    sessions whose eviction bound (last event + gap) passed the final
    watermark, each identical to its batch twin row — the declarative
    counterpart of the applyInPandasWithState sessionizer test."""
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(
        SE.session_windows_builtin(stream), "t_sess_builtin", spark, mode="append"
    )
    got = {
        (r.user_id, r.session_start): (r.session_gap_end, r.n_events, r.session_value)
        for r in out.collect()
    }
    batch = CATALOG["events_session_window_builtin"].fn(spark, SF_ORACLE).collect()
    want = {
        (r.user_id, r.session_start): (r.session_gap_end, r.n_events, r.session_value)
        for r in batch
    }
    assert set(got) <= set(want)
    assert len(got) >= 0.8 * len(want)
    mismatches = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not mismatches


def test_stream_static_enrichment_equals_batch(spark):
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import read_table

    stream = SE.read_event_stream(spark, SF_ORACLE)
    cust = read_table(spark, SF_ORACLE, "customer")
    out = SE.run_to_memory(
        SE.enriched_segment_daily(stream, cust), "t_enrich", spark, mode="update"
    )
    got = {(r.day, r.mktsegment): (r.n_events, r.total_value) for r in out.collect()}
    batch = CATALOG["events_enriched_segment_daily"].fn(spark, SF_ORACLE).collect()
    want = {(r.day, r.mktsegment): (r.n_events, r.total_value) for r in batch}
    assert got == want


def test_foreachbatch_gold_delta_sink_equals_batch(spark, tmp_path):
    stream = SE.read_event_stream(spark, SF_ORACLE)
    path = str(tmp_path / "gold_events_daily")
    SE.run_gold_delta_sink(stream, path, spark)
    got = {(r.day, r.event_type): (r.n_events, r.total_value)
           for r in SE.read_gold_daily(spark, path).collect()}
    batch = CATALOG["events_type_daily"].fn(spark, SF_ORACLE).collect()
    want = {(r.day, r.event_type): (r.n_events, r.total_value) for r in batch}
    assert got == want


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream interval join (view→purchase within 1h) aggregated
    per user equals the batch twin's per-user pair counts/values."""
    stream = SE.read_event_stream(spark, SF_ORACLE)
    pairs = SE.run_to_memory(SE.view_purchase_join(stream), "t_ssj", spark, mode="append")
    got = {
        (r.user_id): (r.n_pairs, r.conv_value)
        for r in pairs.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("conv_value"),
        )
        .collect()
    }
    batch = CATALOG["events_view_purchase_pairs"].fn(spark, SF_ORACLE).collect()
    want = {r.user_id: (r.n_pairs, r.conv_value) for r in batch}
    assert got == want


def test_stream_sliding_equals_batch(spark):
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(SE.sliding_windows(stream), "t_sliding", spark, mode="update")
    got = {r.window_start: (r.n_events, r.total_value) for r in out.collect()}
    batch = CATALOG["events_sliding_15m"].fn(spark, SF_ORACLE).collect()
    want = {r.window_start: (r.n_events, r.total_value) for r in batch}
    assert got == want and len(want) > 0


def test_stream_stream_left_join_matches_batch_finalized(spark):
    """LEFT OUTER stream-stream interval join: matched pairs emit
    immediately; an unmatched view emits its NULL row only once the
    purchase watermark (max purchase_ts − 2h delay) proves its 1h band
    empty. At availableNow termination the stream output must therefore
    be exactly: all matched batch rows + the unmatched batch rows whose
    band closed before the final watermark — and none of the still-open
    unmatched views."""
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(
        SE.view_purchase_left_join(stream), "t_ssj_left", spark, mode="append"
    )
    got = {
        (r.view_id, r.purchase_id): (r.user_id, r.value) for r in out.collect()
    }

    batch = CATALOG["events_view_conversion_flags"].fn(spark, SF_ORACLE)
    # the final watermark is driven by the purchase side's max event time
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        normalize_events_ts,
    )
    ev = normalize_events_ts(ev)
    # Spark's GLOBAL watermark for a stream-stream join is the MIN across
    # BOTH inputs (multipleWatermarkPolicy=min default) — deriving it
    # from the purchase side alone only worked because this fixture's
    # views extend past the last purchase (round-5 advisory)
    maxes = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    )
    per_side = {r.event_type: r.m for r in maxes}
    import datetime

    final_wm = min(per_side["view"], per_side["purchase"]) - datetime.timedelta(hours=2)
    view_ts = {
        r.event_id: r.ts
        for r in ev.filter(F.col("event_type") == "view")
        .select("event_id", "ts")
        .collect()
    }
    want = {}
    n_open = 0
    for r in batch.collect():
        if r.purchase_id is not None:
            want[(r.view_id, r.purchase_id)] = (r.user_id, r.purchase_value)
        elif view_ts[r.view_id] + datetime.timedelta(hours=1) < final_wm:
            want[(r.view_id, None)] = (r.user_id, None)
        else:
            n_open += 1  # still-open view: must NOT have been emitted
    assert got == want
    # the fixture must actually exercise both deferred-null cases
    assert any(k[1] is None for k in want), "no finalized unmatched views in fixture"
    assert n_open > 0, "no still-open views in fixture; test is vacuous"


def test_gold_sink_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restarting the gold sink from its checkpoint must process ONLY
    files that arrived since the last run: after run 1 (file A), run 2
    (file B landed), and run 3 (nothing new), the combined gold equals
    the batch aggregate over A∪B, the row count proves A was not
    re-ingested, and run 3 changes nothing."""
    import glob
    import shutil

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        normalize_events_ts,
    )

    norm = normalize_events_ts(spark.read.parquet(f"{SF_ORACLE}/events.parquet"))
    src = tmp_path / "src"
    src.mkdir()
    gold = str(tmp_path / "gold")

    def land(df, name: str) -> None:
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet"))

    def run() -> None:
        stream = spark.readStream.schema(norm.schema).parquet(str(src))
        SE.run_gold_delta_sink(stream, gold, spark)

    def gold_now():
        return {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in SE.read_gold_daily(spark, gold).collect()
        }

    land(norm.filter(F.col("event_id") % 2 == 0), "a")
    run()
    land(norm.filter(F.col("event_id") % 2 == 1), "b")
    run()  # recovery: checkpoint must skip file a
    got = gold_now()

    want = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in norm.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == want
    # the sharp exactly-once check: total ingested rows == source rows
    # (a re-ingested file A would double its half of the counts)
    assert sum(v[0] for v in got.values()) == norm.count()

    run()  # nothing new: must be a no-op
    assert gold_now() == got


def _protobuf_available() -> bool:
    # transformWithState's Python driver worker speaks protobuf to the
    # JVM state server; this container ships no google.protobuf, so the
    # surface is environment-gated exactly like the PIL/ffmpeg codec
    # stubs (the implementation is real; the dependency is absent)
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


import pytest as _pytest


@_pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState requires protobuf (absent in this container); "
    "surface documented+gated like the codec stubs",
)
def test_transform_with_state_lifetime_stats_multibatch(spark, tmp_path):
    """transformWithStateInPandas per-user lifetime accumulator: with
    maxFilesPerTrigger=1 each landed file is its own micro-batch, so the
    ValueState must survive batch boundaries; the LAST emission per user
    must equal the batch-side per-user aggregate over all files (exact
    integer cents)."""
    import glob
    import shutil

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        normalize_events_ts,
    )

    norm = normalize_events_ts(spark.read.parquet(f"{SF_ORACLE}/events.parquet"))
    src = tmp_path / "src"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = str(tmp_path / f"stage_{name}")
        norm.filter(F.col("event_id") % 2 == half).coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet"))

    stream = (
        spark.readStream.schema(norm.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = SE.run_to_memory(
        SE.lifetime_user_stats(stream), "t_tws", spark, mode="update"
    )
    # Update-mode memory sink appends each batch's emissions; keep the
    # final (maximal n_events) row per user
    rows = out.collect()
    assert len(rows) > len({r.user_id for r in rows}), (
        "expected multiple emissions per user across micro-batches"
    )
    got = {}
    for r in rows:
        prev = got.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            got[r.user_id] = (r.n_events, r.total_cents)

    want = {
        r.user_id: (r.n, r.cents)
        for r in norm.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_stream_daily_psi_monitor_equals_batch(spark):
    """The streaming PSI drift monitor (update mode: every day's final
    score is the last update for its key) must equal the batch twin
    row-for-row — same reference row, same fixed 20-term chain."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.drift import (
        psi_reference_row,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        read_events,
    )

    ref = psi_reference_row(
        read_events(spark, SF_ORACLE).filter(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
        )
    )
    stream = SE.read_event_stream(spark, SF_ORACLE)
    out = SE.run_to_memory(
        SE.daily_psi_monitor(stream, ref), "t_psi", spark, mode="update"
    )
    got = {r.day: (r.n_cand, r.psi) for r in out.collect()}
    batch = CATALOG["drift_psi_daily_monitor"].fn(spark, SF_ORACLE).collect()
    want = {r.day: (r.n_cand, r.psi) for r in batch}
    assert got == want
    assert len(got) > 5
