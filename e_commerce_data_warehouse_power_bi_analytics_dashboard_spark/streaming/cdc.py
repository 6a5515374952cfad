"""Streaming CDC apply (r7 — the 11th streaming surface): a change feed
consumed as a stream, maintaining a queryable snapshot, with semantics
IDENTICAL to the one-shot batch apply (operators/cdc.py).

Why the state is a compacted change log and not the applied snapshot:
CDC ordering is by EVENT sequence, not arrival. A naive foreachBatch
that applied each micro-batch onto the previous batch's applied
snapshot would let a LATE-ARRIVING older change (e.g. a delete with
seq 3 arriving a batch after the seq-5 update it predates) clobber a
newer one — sequential apply is only correct when batches arrive in
sequence order, which CDC explicitly does not promise. The fix is the
same algebra latest-wins already gives us: per key, the
sequence-maximal change record is an ASSOCIATIVE, COMMUTATIVE merge
(max by a strict (order, tiebreak)); folding it batch-by-batch equals
computing it over the whole feed at once, for ANY split and ANY
arrival order. So each micro-batch merges into a per-key compacted
state — full change images INCLUDING delete tombstones (a tombstone
must keep its sequence so an older late update cannot resurrect the
row) — and the serving snapshot is one ``apply_change_feed`` of that
state over the base, exactly the batch operator.

Exactly-once across retries: each epoch writes its merged state to its
own ``v=<epoch>`` directory, computed from the newest version
STRICTLY OLDER than the epoch — a replayed epoch re-reads the same
predecessor and overwrites its own directory with the identical result
(the merge is deterministic), never double-applying.

At 100 TB: the state table is key-grain (one row per ever-touched key),
bucketed on the key so the per-batch merge and the serving join are
co-partitioned; versions are retained per retention policy and vacuumed
like any log-structured table.
"""

from __future__ import annotations

import os
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import apply_change_feed
from ..operators.dedup import latest_wins

_V_RE = re.compile(r"^v=(\d+)$")


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(path)
        if (m := _V_RE.match(d)) and os.path.isdir(os.path.join(path, d))
    )


def run_cdc_stream_apply(
    feed_stream: DataFrame,
    path: str,
    spark: SparkSession,
    key: str,
    payload: Sequence[str],
    order_col: str,
    tiebreak: str,
    op_col: str = "op",
) -> None:
    """Consume ``feed_stream`` (schema: key, op, *payload, order_col,
    tiebreak) with ``availableNow`` + checkpoint, folding each
    micro-batch into the compacted per-key state under ``path/v=<n>``."""
    cols = [key, op_col, *list(payload), order_col, tiebreak]

    def fold(batch: DataFrame, epoch_id: int) -> None:
        prior = [v for v in _versions(path) if v < int(epoch_id)]
        fresh = batch.select(*cols)
        if prior:
            prev = spark.read.parquet(os.path.join(path, f"v={max(prior)}"))
            fresh = prev.select(*cols).unionByName(fresh)
        merged = latest_wins(fresh, key, order_col, tiebreak)
        merged.write.mode("overwrite").parquet(
            os.path.join(path, f"v={int(epoch_id)}")
        )

    q = (
        feed_stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", path + "_chk")
        .start()
    )
    q.awaitTermination()


def read_cdc_state(spark: SparkSession, path: str) -> DataFrame:
    """The newest compacted change state (one sequence-maximal change
    record per ever-touched key, tombstones included)."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no CDC state versions under {path}")
    return spark.read.parquet(os.path.join(path, f"v={vs[-1]}"))


def read_cdc_snapshot(
    spark: SparkSession,
    base: DataFrame,
    path: str,
    key: str,
    payload: Sequence[str],
    order_col: str,
    tiebreak: str,
    op_col: str = "op",
) -> DataFrame:
    """The serving snapshot: the batch operator applied to the streamed
    state — bit-identical to ``apply_change_feed(base, whole_feed)`` by
    the merge associativity argument in the module docstring."""
    return apply_change_feed(
        base, read_cdc_state(spark, path), key, payload, order_col,
        tiebreak, op_col,
    )
