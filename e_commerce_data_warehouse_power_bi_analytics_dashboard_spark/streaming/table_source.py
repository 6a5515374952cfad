"""Structured-Streaming SOURCE for the table format's change data feed
(r9 — the 16th streaming surface): ``spark.readStream.format(
"table_changes")`` over a versioned-manifest table, built on PySpark 4's
public Python Data Source API (pyspark.sql.datasource).

The batch ``change_feed`` (operators/table_format.py) answers "what
changed between versions X and Y" on demand; this source turns the same
commit log into a LIVE stream: the offset IS the committed version
number, ``latestOffset`` polls the manifest directory (driver-side
KB-sized listing), ``partitions`` plans ONE input partition per new
commit, and ``read`` reconstructs that commit's row-level changes
executor-side with pyarrow — old files minus the delete vectors live at
v-1, merge-on-read vector pre-images, adds-vs-removes key diff — the
same semantics as the JVM path, independently reimplemented, so the
stream==batch equivalence test cross-checks two engines, not one code
path twice.

Exactly-once falls out of the offset contract: Spark checkpoints the
last processed version; a restart resumes from it and a replayed batch
re-reads IMMUTABLE files named by IMMUTABLE manifests, so the same
offset range always yields the same rows (the property Delta's CDF
streaming relies on). At 100 TB each micro-batch's cost follows the
commits' touched files, never table size — identical to the batch feed.

Driver-vs-executor split: offset resolution and partition planning read
only manifest JSON (driver, metadata-sized); row reconstruction runs in
the partition reader (executor) over just that commit's files.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: change-row metadata columns appended after key+payload
_META_COLS = [
    StructField("_change_type", StringType()),
    StructField("_commit_version", IntegerType()),
]


def _manifest(root: str, version: int) -> dict:
    with open(
        os.path.join(root, "_commits", f"{version:08d}.json")
    ) as fh:
        return json.load(fh)


def _versions(root: str) -> list[int]:
    d = os.path.join(root, "_commits")
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        stem, ext = os.path.splitext(f)
        if ext == ".json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _norm(a) -> dict:
    return {"path": a} if isinstance(a, str) else a


def _live_vectors(root: str, version: int) -> set[tuple[str, int]]:
    """(file, position) pairs of delete vectors live at ``version`` —
    the same delete_adds/delete_removes fold as the JVM side, then the
    vector parquet rows themselves (change-batch-sized by design)."""
    import pyarrow.parquet as pq

    live: dict[str, dict] = {}
    for v in _versions(root):
        if v > version:
            break
        m = _manifest(root, v)
        for p in m.get("delete_removes", []):
            live.pop(p, None)
        for a in m.get("delete_adds", []):
            rec = _norm(a)
            live[rec["path"]] = rec
    pairs: set[tuple[str, int]] = set()
    for relp in live:
        t = pq.read_table(os.path.join(root, relp))
        for f, p in zip(
            t.column("_tf_dfile").to_pylist(), t.column("_tf_dpos").to_pylist()
        ):
            pairs.add((f, int(p)))
    return pairs


def _read_rows(
    root: str, rels: Sequence[str], cols: Sequence[str]
) -> list[tuple[str, int, tuple]]:
    """Rows of the named files as (file, position, value-tuple)."""
    import pyarrow.parquet as pq

    out = []
    for relp in rels:
        t = pq.read_table(os.path.join(root, relp), columns=list(cols))
        vals = [t.column(c).to_pylist() for c in cols]
        for i in range(t.num_rows):
            out.append((relp, i, tuple(v[i] for v in vals)))
    return out


def commit_changes(
    root: str, version: int, key: str, payload: Sequence[str]
) -> Iterator[tuple]:
    """Row-level changes of ONE commit, reconstructed with pyarrow —
    the executor-side twin of operators/table_format.py::change_feed's
    per-commit diff. Yields (key, *payload, _change_type,
    _commit_version) tuples."""
    m = _manifest(root, version)
    cols = [key, *payload]
    if m.get("op") == "update":
        # MoR UPDATE: adds are exactly the matched rows' updated images
        for _f, _p, vals in _read_rows(
            root, [_norm(a)["path"] for a in m["adds"]], cols
        ):
            yield (*vals, "update_postimage", version)
        return
    vecs_before = _live_vectors(root, version - 1)
    old_rows = [
        r for r in _read_rows(root, m["removes"], cols)
        if (r[0], r[1]) not in vecs_before
    ]
    new_rows = _read_rows(
        root, [_norm(a)["path"] for a in m["adds"]], cols
    )
    # merge-on-read commit: pre-images of the vectored positions (a
    # selective compact's delete_adds are rewritten remainders of
    # vectors it split — bookkeeping, not new deletes)
    dvec = (
        [] if m.get("op") == "compact"
        else [_norm(d) for d in m.get("delete_adds", [])]
    )
    if dvec:
        import pyarrow.parquet as pq

        pairs: set[tuple[str, int]] = set()
        for d in dvec:
            t = pq.read_table(os.path.join(root, d["path"]))
            for f, p in zip(
                t.column("_tf_dfile").to_pylist(),
                t.column("_tf_dpos").to_pylist(),
            ):
                pairs.add((f, int(p)))
        ref_files = sorted({f for f, _ in pairs})
        vec_pre = [
            (relp, pos, vals)
            for relp, pos, vals in _read_rows(root, ref_files, cols)
            if (relp, pos) in pairs
        ]
        if m.get("op") == "merge_mor":
            # a streaming MoR merge vectors EVERY fed key's pre-image
            # and appends the I/U post-images in the same commit: fold
            # the pre-images into the key diff below so updates
            # classify as update_postimage, not delete+insert pairs
            # (same rule as the batch change_feed)
            old_rows.extend(vec_pre)
        else:
            for _relp, _pos, vals in vec_pre:
                yield (*vals, "delete", version)
    if not old_rows and not new_rows:
        return
    old_by_key = {r[2][0]: r[2] for r in old_rows}
    new_by_key = {r[2][0]: r[2] for r in new_rows}
    for k, vals in new_by_key.items():
        if k not in old_by_key:
            yield (*vals, "insert", version)
        elif vals != old_by_key[k]:
            yield (*vals, "update_postimage", version)
        # equal pre/post -> carried by a rewrite, not a change
    for k, vals in old_by_key.items():
        if k not in new_by_key:
            yield (*vals, "delete", version)


class CommitPartition(InputPartition):
    def __init__(self, root: str, version: int, key: str, payload: list[str]):
        self.root, self.version = root, version
        self.key, self.payload = key, payload


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.key = options["key"]
        self.payload = [
            c.strip() for c in options["payload"].split(",") if c.strip()
        ]
        self.start_version = int(options.get("startversion", "0"))
        mct = options.get("maxcommitspertrigger")
        self.max_commits = int(mct) if mct else None
        #: last batch-end version this reader planned; the admission
        #: floor for the rate limit. None until we learn it — from
        #: initialOffset on a fresh start, or from the first
        #: partitions() call after a checkpoint restart (whose start
        #: offset comes from the checkpoint) — until then latestOffset
        #: is unthrottled (the same restart burst Delta's
        #: maxFilesPerTrigger shows). NOTE: pacing shapes
        #: processingTime/continuous triggers, where latestOffset is
        #: polled per tick; Trigger.AvailableNow in the Python Data
        #: Source API captures ONE end offset up front and drains to it
        #: in a single batch, so it cannot observe per-trigger limits.
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        # versions <= start_version are history the consumer skips
        # (startVersion=0 streams everything after the create commit)
        self._last_end = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        vs = _versions(self.root)
        latest = vs[-1] if vs else self.start_version
        if self.max_commits is not None and self._last_end is not None:
            # admit at most N committed versions past the last planned
            # end — bounded micro-batches over a backlog
            admitted = [
                v for v in vs if self._last_end < v <= latest
            ][: self.max_commits]
            if admitted:
                latest = admitted[-1]
            else:
                latest = self._last_end
        return {"version": latest}

    def partitions(self, start: dict, end: dict) -> list[CommitPartition]:
        self._last_end = end["version"]
        return [
            CommitPartition(self.root, v, self.key, self.payload)
            for v in _versions(self.root)
            if start["version"] < v <= end["version"]
        ]

    def read(self, partition: CommitPartition) -> Iterator[tuple]:
        return commit_changes(
            partition.root, partition.version, partition.key,
            partition.payload,
        )

    def commit(self, end: dict) -> None:  # manifests are immutable
        pass


class TableChangesDataSource(DataSource):
    """``spark.readStream.format("table_changes")`` after
    ``spark.dataSource.register(TableChangesDataSource)``. Options:
    ``root`` (table root), ``key``, ``payload`` (comma-separated),
    ``startVersion`` (exclusive, default 0 — the create commit is
    history, not change)."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> StructType:
        # key+payload field types come from the table's own recorded
        # writer schema (manifest JSON — no data read)
        root = self.options["root"]
        key = self.options["key"]
        payload = [
            c.strip() for c in self.options["payload"].split(",") if c.strip()
        ]
        vs = _versions(root)
        if not vs:
            raise FileNotFoundError(f"no commits at {root}")
        recorded: StructType | None = None
        for v in reversed(vs):
            s = _manifest(root, v).get("schema")
            if s:
                recorded = StructType.fromJson(json.loads(s))
                break
        if recorded is None:
            raise ValueError(f"no schema recorded in any manifest at {root}")
        by_name = {f.name: f for f in recorded.fields}
        fields = [by_name[c] for c in (key, *payload)]
        return StructType(fields + _META_COLS)

    def streamReader(self, schema: StructType) -> TableChangesStreamReader:
        return TableChangesStreamReader(dict(self.options))
