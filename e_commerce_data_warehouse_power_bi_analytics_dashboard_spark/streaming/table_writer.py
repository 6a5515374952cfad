"""Structured-Streaming SINK into the table format via the Python Data
Source API (r9 — completes the source/sink symmetry with
streaming/table_source.py): ``df.writeStream.format("table_append")``
appends each micro-batch to a versioned-manifest table as one ACID
commit.

This is the real DSv2 sink shape, not a foreachBatch wrapper (that
path exists too — streaming/table_sink.py runs MERGE semantics through
foreachBatch): EXECUTORS stage immutable parquet files under an
attempt-unique directory and ship back (path, rows, footer-stats)
commit messages; the DRIVER's ``commit(messages, batchId)`` publishes
one append manifest naming exactly those files — the
files-then-atomic-metadata protocol every real lake sink uses, so a
torn write is invisible by construction (files without a manifest are
orphans for vacuum's grace window, the same guarantee concurrent
writers already rely on).

Exactly-once: the micro-batch ``batchId`` — namespaced by ``writerId``
when several queries share one table, since batchIds restart from 0
per query — is recorded as the commit's ``epoch``. On
checkpoint-recovery replay the tasks re-stage fresh orphan files, but
``commit`` finds the epoch already published and no-ops — rows land
exactly once, replay debris is reclaimed by vacuum.
A CommitConflict from a concurrent writer retries at the next version
(bounded), since an append commutes with any interleaved commit.

Stats ship FROM the tasks (pyarrow footer metadata read right after
writing, KB-sized) so the driver never re-reads data to build the
manifest — at 100 TB the driver's work is one JSON write per batch.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa


@dataclass
class FileCommitMessage(WriterCommitMessage):
    path: str | None  # root-relative; None = empty partition
    rows: int
    stats: dict


class TableAppendStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict):
        self.root = options["root"]
        # epoch idempotence must be scoped PER WRITER: batchIds restart
        # from 0 for every distinct streaming query, so keying replay
        # detection on batchId alone would silently drop a SECOND
        # query's early batches (they'd look like replays of the
        # first's). writerId names the logical writer — same value
        # across restarts of one query (its checkpoint), distinct
        # across queries. Single-writer tables may omit it.
        self.writer_id = options.get("writerid", "")
        self.files_dir = os.path.join("data", f"stream-{uuid.uuid4().hex[:8]}")
        # incremental epoch index: replay detection used to re-read
        # EVERY manifest on every micro-batch (O(V^2) driver-side JSON
        # reads over a long stream's lifetime); instead fold each
        # manifest exactly once into an in-memory set. A fresh writer
        # (first batch, or restart after recovery) scans the whole log
        # once; every later batch only reads manifests committed since.
        self._seen_epochs: set = set()
        self._epochs_scanned_to = -1

    def _epoch_seen(self, epoch) -> bool:
        from ..operators import table_format as tf

        for v in tf.list_versions(self.root):
            if v <= self._epochs_scanned_to:
                continue
            e = tf.read_manifest(self.root, v).get("epoch")
            if e is not None:
                self._seen_epochs.add(e)
            self._epochs_scanned_to = max(self._epochs_scanned_to, v)
        return epoch in self._seen_epochs

    def _epoch(self, batchId: int):
        return f"{self.writer_id}/{batchId}" if self.writer_id else int(batchId)

    # -- executor side ----------------------------------------------------
    def write(self, iterator: Iterator["pa.RecordBatch"]) -> FileCommitMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return FileCommitMessage(path=None, rows=0, stats={})
        table = pa.Table.from_batches(batches)
        rel = os.path.join(
            self.files_dir, f"part-{uuid.uuid4().hex}.parquet"
        )
        abs_path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        pq.write_table(table, abs_path)
        # footer stats, task-side: the driver builds the manifest from
        # these messages without ever touching the data again
        from ..operators.table_format import _file_stats

        st = _file_stats(abs_path)
        return FileCommitMessage(path=rel, rows=st["rows"], stats=st["stats"])

    # -- driver side -------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        from ..operators import table_format as tf

        epoch = self._epoch(batchId)
        if self._epoch_seen(epoch):
            return  # replayed epoch: already committed, no-op
        adds = [
            {"path": m.path, "rows": m.rows, "stats": m.stats}
            for m in messages
            if m is not None and m.path is not None
        ]
        for _attempt in range(16):  # appends commute; retry on conflict
            versions = tf.list_versions(self.root)
            new_v = versions[-1] + 1 if versions else 0
            try:
                tf._publish(self.root, new_v, {
                    "version": new_v, "op": "append", "adds": adds,
                    "removes": [], "epoch": epoch,
                    "n_changes": sum(a["rows"] for a in adds),
                })
                return
            except tf.CommitConflict:
                continue
        raise tf.CommitConflict(
            f"append epoch {batchId} lost 16 version races at {self.root}"
        )

    def abort(self, messages, batchId: int) -> None:
        # best-effort: staged files are orphans either way (no manifest
        # references them), so vacuum reclaims whatever this misses
        for m in messages:
            if m is not None and getattr(m, "path", None):
                try:
                    os.unlink(os.path.join(self.root, m.path))
                except OSError:
                    pass


class TableAppendDataSource(DataSource):
    """``df.writeStream.format("table_append").option("root", ...)``
    after ``spark.dataSource.register(TableAppendDataSource)``. The
    table must already exist (create_table pins schema + spec);
    streaming-appended files are unpartitioned (spec-partitioned
    streaming writes would need per-partition task routing — out of
    scope, use the foreachBatch MERGE sink for that). When MORE THAN
    ONE streaming query appends to the same table, each must set a
    distinct ``writerId`` (stable across its own restarts): epoch
    replay detection is keyed on (writerId, batchId), and batchIds
    restart from 0 per query."""

    @classmethod
    def name(cls) -> str:
        return "table_append"

    def streamWriter(self, schema, overwrite: bool) -> TableAppendStreamWriter:
        if overwrite:
            raise ValueError("table_append supports append mode only")
        return TableAppendStreamWriter(dict(self.options))
