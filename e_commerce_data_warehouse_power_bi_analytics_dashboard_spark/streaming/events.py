"""Structured Streaming ingest over the events table (SURVEY §2.9 —
beyond-reference extension; the reference lists real-time ingestion as
future work, README:178-183).

Shapes provided:
  - watermarked tumbling-window aggregation (the streaming twin of
    plans/events_queries.py::events_hourly_tumble)
  - watermark + dropDuplicates exactly-once-per-event_id ingest
  - custom stateful sessionization via applyInPandasWithState (the one
    place Python state handling is genuinely needed; everything else
    stays JVM-side)
  - stream-static enrichment join (broadcast dim probe per micro-batch)
  - stream-stream interval joins with two-sided watermark state
    eviction (view→purchase conversions) — inner AND left-outer (the
    outer flavor's deferred null emission is pinned by test)
  - sliding 1h/15m windows; a foreachBatch epoch-delta gold sink with
    checkpoint-recovery exactly-once (tested)
  - per-user lifetime stats via transformWithStateInPandas (Spark 4
    StatefulProcessor; container-gated on protobuf, see its docstring)

At scale these run against a Kafka/file source with the same plan; the
parquet file source here is the test harness. Watermark of 2 hours
bounds state: windows/sessions older than (max event time - 2h) are
finalized and evicted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of events with typed timestamps.

    The file source needs an explicit schema; rather than hard-coding
    one (the testdata's physical ts encoding has drifted across rounds:
    TIMESTAMP(NANOS)-as-long vs timestamp[us]-as-NTZ), take it from a
    batch footer read of the same file, then normalize ``ts`` through
    the exact helper the batch path uses — stream and batch cannot
    disagree on timestamp semantics.
    """
    from ..sources.tpch import normalize_events_ts, read_table

    raw_schema = read_table(spark, sf_dir, "events").schema
    raw = (
        spark.readStream.schema(raw_schema)
        # file source wants a directory; the sf dir holds all tables, so
        # glob-filter down to the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def hourly_windows(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour aggregate (late data beyond the
    watermark is dropped; state for closed windows is evicted)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def sliding_windows(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked SLIDING 1-hour/15-minute aggregate — each event
    contributes to 4 overlapping windows (hop = 15 min), the trending /
    moving-rate shape tumbling windows can't express. State per open
    window, evicted once the watermark passes window end; late data
    lands in every still-open window it belongs to. Batch twin:
    plans/events_queries.py::events_sliding_15m."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def deduped_ingest(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-event_id ingest with BOUNDED dedup state.

    ``dropDuplicatesWithinWatermark`` evicts per-key state once the
    watermark passes the event's time — plain ``dropDuplicates`` on a
    subset that excludes the event-time column never evicts, so its
    state grows without bound on an unbounded stream. The contract is
    slightly weaker (duplicates are only suppressed when they arrive
    within the watermark delay of the original), which is exactly the
    guarantee a late-data watermark pipeline can honestly make.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("value", DoubleType()),
    ]
)

GAP_SECONDS = 1800


def _sessionize_user(key, pdf_iter, state):
    """applyInPandasWithState fn: per-user 30-min-gap sessions.

    Emits every closed session; an open session is kept in state and
    flushed on event-time timeout (watermark passing last_seen + gap).
    """
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, value = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "total_value": [round(value, 2)],
            }
        )
        return

    rows = pd.concat(list(pdf_iter)).sort_values("ts")
    ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
    vals = rows["value"].tolist()

    if state.exists:
        start_us, last_us, n, value = state.get
    else:
        start_us, last_us, n, value = None, None, 0, 0.0

    closed = []
    for t, v in zip(ts_us.tolist(), vals):
        if start_us is None:
            start_us, last_us, n, value = t, t, 1, v
        elif t - last_us > GAP_SECONDS * 1_000_000:
            closed.append((start_us, last_us, n, value))
            start_us, last_us, n, value = t, t, 1, v
        else:
            last_us, n, value = t, n + 1, value + v

    state.update((start_us, last_us, n, value))
    state.setTimeoutTimestamp(last_us // 1000 + GAP_SECONDS * 1000)  # ms watermark timeout

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                "n_events": [n for *_, n, _ in closed],
                "total_value": [round(v, 2) for *_, v in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: gap-based sessions via
    applyInPandasWithState (event-time timeout keyed per user)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def session_windows_builtin(events: DataFrame, watermark: str = "2 hours",
                            gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via the BUILT-IN ``session_window`` — the
    Catalyst-native declarative twin of ``sessionize_stream``'s custom
    applyInPandasWithState operator (same per-user session state machine
    run inside the engine's UpdatingSessionsExec/MergingSessionsExec,
    JVM-side, no Python workers). Semantics note: events exactly ``gap``
    apart start a NEW session here (window merge requires ts < prev end
    strictly), while the lag-based batch rule keeps strict-greater-only
    splits — identical on any corpus without exact-gap deltas, and the
    batch entry this is equivalence-tested against uses session_window
    itself so the pair is exact by construction. The window's ``end`` is
    last event ts + gap (the eviction bound the watermark compares
    against), unlike the custom operator's last-event-ts session_end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_gap_end"),
            "n_events",
            "session_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, spark: SparkSession, mode: str = "update") -> DataFrame:
    """Drain a stream with availableNow into an in-memory table (tests/bench)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def enriched_segment_daily(events: DataFrame, customers: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Stream-static join + windowed aggregate: enrich the event stream
    with the (static, broadcast) customer dim, then a watermarked daily
    tumbling aggregate per market segment.

    Stream-static joins need no stream-side state: each micro-batch
    probes the static side (broadcast here — the dim is small), so the
    only stateful operator is the windowed agg, bounded by the
    watermark. Batch twin: plans/events_queries.py::
    events_enriched_segment_daily.
    """
    cust = customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(cust), "user_id")
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "mktsegment",
            "n_events",
            "total_value",
        )
    )


def run_gold_delta_sink(events: DataFrame, path: str, spark: SparkSession) -> None:
    """Streaming → incremental gold maintenance via ``foreachBatch``.

    Each micro-batch is aggregated to (day, event_type) partial sums and
    APPENDED as a delta partition keyed by the batch epoch — the gold
    table is "base + deltas", combined on read by :func:`read_gold_daily`
    (the same distributive-measure algebra as
    plans/incremental.py::mv_incremental_refresh, driven by a stream).

    Idempotence under retries: the write dynamically overwrites ONLY its
    own ``epoch_id=<n>`` partition, so a replayed batch replaces rather
    than double-counts itself — exactly-once at the sink without
    read-modify-write of the whole gold table.
    """

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        delta = (
            batch.groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                "event_type",
            )
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,2)")).alias("value_dec"),
            )
            .withColumn("epoch_id", F.lit(int(epoch_id)))
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(path)
        )

    q = (
        events.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", path + "_chk")
        .start()
    )
    q.awaitTermination()


def read_gold_daily(spark: SparkSession, path: str) -> DataFrame:
    """Combine the delta partitions written by :func:`run_gold_delta_sink`
    into the gold (day, event_type) aggregate — exact DECIMAL partial
    sums make the combine lossless regardless of how batches split."""
    return (
        spark.read.parquet(path)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("value_dec"), 2).cast("double").alias("total_value"),
        )
    )


def view_purchase_join(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each view matched to the same user's
    purchases within the following hour (pair grain).

    Both sides carry a watermark and the join condition bounds
    ``purchase_ts`` relative to ``view_ts``, so Spark derives state
    eviction for BOTH buffers: a buffered view can be dropped once the
    purchase watermark passes ``view_ts + 1h``, a buffered purchase once
    the view watermark passes ``purchase_ts``. Without the time-band
    condition the join state would grow without bound — the stream-stream
    analog of the dropDuplicatesWithinWatermark contract above.

    Batch twin: plans/events_queries.py::events_view_purchase_pairs
    (equivalence pinned in tests/test_streaming.py).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    return views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).drop("p_user_id")


def view_purchase_left_join(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view emits — with its
    matching purchase (within the following hour) or with NULLs once the
    match window is provably closed.

    Matched pairs emit as soon as both sides arrive (inner-join path).
    An UNMATCHED view can only emit when the engine can prove no future
    purchase will match, i.e. when the purchase-side watermark passes
    ``view_ts + 1h`` — so null rows trail the data by (band + delay), and
    views newer than that at stream end stay buffered, not emitted. That
    conditional-finalization contract is pinned by
    tests/test_streaming.py::test_stream_stream_left_join_matches_batch_finalized,
    which splits the batch twin (plans/events_queries.py::
    events_view_conversion_flags) into finalized and still-open views.

    State eviction is the same two-sided bound as the inner join above;
    the outer flavor adds no state, only deferred emission.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    return views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).drop("p_user_id")


# ---------------------------------------------------------------------------
# transformWithState — the Spark 4 arbitrary-state API (successor to
# applyInPandasWithState), demonstrated as per-user lifetime stats
# ---------------------------------------------------------------------------

LIFETIME_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint"
)


def lifetime_user_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user lifetime event count + exact cents sum via
    ``transformWithStateInPandas`` (Spark 4 ``StatefulProcessor``).

    The state is ONE ValueState row per user — the arbitrary-state
    successor API to ``applyInPandasWithState`` (used by the sessionizer
    above): explicit named state variables with schemas, optional TTL,
    and timers, instead of a single opaque tuple. Each batch updates the
    accumulator and emits the user's new lifetime totals (Update mode),
    so the LAST emission per user equals the batch aggregate — the
    equivalence the test pins across a MULTI-BATCH run
    (maxFilesPerTrigger=1 forces state to survive batch boundaries).

    Exactness: values are accumulated as integer cents (the doubles are
    2-decimal amounts, so ``round(v*100)`` is lossless), keeping the
    engine's cross-engine hashing discipline inside Python state.

    Scale: state is hash-partitioned by user_id and O(1) per user;
    at 100 TB the RocksDB state store + changelog checkpointing carries
    it (configuration, not code).

    CONTAINER GATE: the transformWithState Python driver worker needs
    ``google.protobuf``, which this container does not ship — the
    equivalence test skips with that reason (the same honest gating as
    the PIL/ffmpeg codec stubs); on a standard cluster (protobuf is a
    stock PySpark dependency) the surface runs as written.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Lifetime(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            n, cents = (0, 0)
            if self._agg.exists():
                n, cents = self._agg.get()
            for pdf in rows:
                n += len(pdf)
                # per-ROW cents conversion (each 2-dec double × 100 is
                # within 1 ulp of its integer → rounds exactly), THEN an
                # integer sum — summing the doubles first would let float
                # error cross the half-cent line on long histories
                cents += int((pdf["value"] * 100).round().astype("int64").sum())
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _Lifetime(), LIFETIME_SCHEMA, outputMode="Update", timeMode="None"
        )
    )


def daily_psi_monitor(
    events: DataFrame, ref: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming drift monitor: per-day PSI of the event-value
    distribution against a STATIC reference row (broadcast probe per
    micro-batch) — the standing what-changed-today score a training-
    data ingest publishes. Tenth streaming surface; the whole 20-bin
    histogram pivots into the one watermarked windowed aggregation
    (psi_daily_windows — the shared batch/stream core), because a
    second normalization aggregate would be an illegal chained
    stateful op. Batch twin: plans/drift_queries.py::
    drift_psi_daily_monitor (equivalence-tested)."""
    from ..operators.drift import psi_daily_windows

    return psi_daily_windows(events.withWatermark("ts", watermark), ref)
