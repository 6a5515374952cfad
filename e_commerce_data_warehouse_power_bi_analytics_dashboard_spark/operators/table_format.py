"""Minimal ACID table format: a versioned-manifest parquet table with
copy-on-write MERGE, snapshot isolation, time travel, and vacuum.

The reference's upsert is a row-level ``INSERT ... ON CONFLICT DO
UPDATE`` against a mutable heap table (ETL.sql:304-315). On an
immutable-file lake that operation needs a TABLE FORMAT: data lives in
parquet files that are never mutated, and a commit log of manifests
says which files are active at each version. This module is the
smallest honest implementation of that idea (the Delta/Iceberg core,
hand-rolled from public first principles):

``<root>/_commits/<n>.json``  one manifest per commit — ``adds`` /
    ``removes`` of data-file paths relative to the table root, the op
    kind, and a row-level change count. The ACTIVE file set at version
    ``v`` is fold(adds) - fold(removes) over commits 0..v.
``<root>/data/v=<n>/part-*.parquet``  immutable data files, one
    directory per commit that wrote any.

Commit atomicity + optimistic concurrency: the manifest is written to a
temp name and published with ``os.link`` to its final ``<n>.json`` —
link fails with EEXIST if a concurrent writer already claimed version
``n``, so exactly one of two racing writers wins and the loser sees a
clean ``CommitConflict`` to retry on (putIfAbsent semantics; on a real
object store this maps to conditional PUT). Readers never block: a
snapshot resolves the commit list ONCE and reads only files those
manifests name, so an in-flight writer (data files present, manifest
not yet linked) is invisible — snapshot isolation by construction.

MERGE is COPY-ON-WRITE at file granularity, the property that makes it
viable at 100 TB: the feed's distinct keys are joined (broadcast —
change batches are small vs the table) against a (key, file) projection
of the current snapshot to find TOUCHED files; only those are rewritten
(their rows + the feed run through operators/cdc.py apply_change_feed —
the same latest-wins merge the streaming path uses), every untouched
file is carried forward by reference in the manifest. Merge cost is
proportional to touched files, never table size. Time travel
(``read_version``) is a fold over the same manifests; ``vacuum``
deletes files unreferenced by any retained version.

Single-table, single-cluster scope. ADDITIVE schema evolution is
supported via ``append`` (new files may carry new columns; a
merge_schema snapshot reads old files' values as NULL — the
tf_append_schema_evolution entry); type changes still require a
rewrite and are out of scope.
"""

from __future__ import annotations

import glob
import itertools
import json
import os
import re
import threading
from typing import Sequence

#: monotonically-unique suffix for commit temp files (per-attempt)
_ATTEMPT = itertools.count()

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import apply_change_feed


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic loser)."""


def _commit_dir(root: str) -> str:
    return os.path.join(root, "_commits")


def _commit_path(root: str, version: int) -> str:
    return os.path.join(_commit_dir(root), f"{version:08d}.json")


def list_versions(root: str) -> list[int]:
    """Committed versions, ascending (only published manifests count)."""
    out = []
    for p in glob.glob(os.path.join(_commit_dir(root), "*.json")):
        stem = os.path.splitext(os.path.basename(p))[0]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def read_manifest(root: str, version: int) -> dict:
    with open(_commit_path(root, version)) as fh:
        return json.load(fh)


def _publish(root: str, version: int, manifest: dict) -> None:
    """Atomically publish a manifest as version ``version``.

    Write-to-temp + hard-link-to-final: the link is the commit point and
    fails (EEXIST) if the version was already claimed — exactly one of
    N racing writers wins.
    """
    os.makedirs(_commit_dir(root), exist_ok=True)
    final = _commit_path(root, version)
    # temp name must be unique per ATTEMPT, not per process — two
    # threads of one writer (or a retry) sharing a pid-only name would
    # clobber each other's temp mid-link (caught by the race test)
    tmp = final + f".tmp.{os.getpid()}.{threading.get_ident()}.{next(_ATTEMPT)}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        raise CommitConflict(
            f"version {version} already committed at {root}"
        ) from e
    finally:
        os.unlink(tmp)


def active_files(root: str, version: int | None = None) -> list[str]:
    """Active data files (relative paths) at ``version`` (default: latest),
    by folding adds/removes over the commit log prefix."""
    versions = list_versions(root)
    if not versions:
        raise FileNotFoundError(f"no commits at {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    active: set[str] = set()
    for v in versions:
        if v > version:
            break
        m = read_manifest(root, v)
        active -= set(m["removes"])
        active |= set(m["adds"])
    return sorted(active)


def _data_files(root: str, version: int) -> list[str]:
    """Relative paths of the parquet part files under data/v=<version>
    (recursive — cluster columns add hive-style subdirectories)."""
    vdir = os.path.join(root, "data", f"v={version}")
    return sorted(
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True)
    )


def _write_data(
    df: DataFrame,
    root: str,
    version: int,
    files: int,
    cluster_by: str | None,
) -> list[str]:
    vdir = os.path.join(root, "data", f"v={version}")
    if cluster_by:
        # hive-partition on a COPY of the cluster column (``_pk``) so the
        # column itself stays inside the data files — snapshots read
        # explicit file lists, never directory-inferred partition values.
        # Deterministic key→file placement is what lets MERGE prove
        # which files a change batch can possibly touch.
        (
            df.withColumn("_pk", F.col(cluster_by))
            .repartition(F.col("_pk"))
            .write.mode("overwrite")
            .partitionBy("_pk")
            .parquet(vdir)
        )
    else:
        df.coalesce(files).write.mode("overwrite").parquet(vdir)
    return _data_files(root, version)


def create_table(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    files: int = 4,
    cluster_by: str | None = None,
) -> int:
    """Commit 0: materialize ``df`` as the table's initial snapshot.
    ``cluster_by`` (optional) hive-clusters data files on a column so
    key-localized MERGEs rewrite a bounded file subset."""
    adds = _write_data(df, root, 0, files, cluster_by)
    _publish(root, 0, {
        "version": 0, "op": "create", "adds": adds, "removes": [],
        "n_changes": df.count(), "cluster_by": cluster_by,
    })
    return 0


def read_version(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot read: the table exactly as of ``version`` (default
    latest). Resolves the manifest fold once, then reads only the named
    files — concurrent in-flight writers are invisible.
    ``merge_schema`` unions file schemas across commits (needed after an
    evolved ``append``; costs a footer read per file, so off by
    default)."""
    files = [os.path.join(root, f) for f in active_files(root, version)]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*files)


def append(
    spark: SparkSession, root: str, df: DataFrame, files: int = 4
) -> int:
    """INSERT INTO as a commit: add new data files, remove nothing —
    the cheapest write a table format supports (no read, no rewrite).
    ``df`` may carry MORE columns than earlier commits (schema
    evolution by addition): old files simply lack the column and a
    ``merge_schema`` snapshot reads them as NULL — the additive half of
    evolution, without the rewrite a type change would force."""
    versions = list_versions(root)
    new_v = versions[-1] + 1
    cb = read_manifest(root, 0).get("cluster_by")
    adds = _write_data(df, root, new_v, files, cb if cb in df.columns else None)
    _publish(root, new_v, {
        "version": new_v, "op": "append", "adds": adds, "removes": [],
        "n_changes": df.count(),
    })
    return new_v


def merge(
    spark: SparkSession,
    root: str,
    feed: DataFrame,
    key: str,
    payload: Sequence[str],
    order_col: str,
    tiebreak: str,
    files: int = 4,
) -> int:
    """Copy-on-write MERGE of a CDC ``feed`` (op ∈ {'I','U','D'} full-row
    images — the apply_change_feed contract) into the table.

    Only files containing a fed key are rewritten; untouched files are
    carried forward by reference. Returns the new version number (raises
    CommitConflict if a concurrent writer claimed it first).
    """
    versions = list_versions(root)
    new_v = versions[-1] + 1
    cluster_by = read_manifest(root, 0).get("cluster_by")
    current = sorted(active_files(root))
    cur_df = read_version(spark, root).withColumn(
        "_tf_file", F.input_file_name()
    )
    # normalize input_file_name's file:// URI back to a root-relative
    # path: take everything after "<abs root>/", scheme-agnostic
    rel = F.regexp_extract(
        "_tf_file", re.escape(os.path.abspath(root)) + "/(.*)$", 1
    )
    cur_df = cur_df.withColumn("_tf_file", rel)
    keys = feed.select(F.col(key)).distinct()
    touched = [
        r[0]
        for r in cur_df.join(F.broadcast(keys), key, "left_semi")
        .select("_tf_file").distinct().collect()
    ]  # file list is manifest-sized metadata, never row data
    touched_set = set(touched)
    base_rows = cur_df.filter(
        F.col("_tf_file").isin(touched) if touched else F.lit(False)
    ).select(key, *payload)
    merged = apply_change_feed(
        base_rows, feed, key, payload, order_col, tiebreak
    ).select(key, *payload)
    adds = _write_data(merged, root, new_v, files, cluster_by)
    _publish(root, new_v, {
        "version": new_v, "op": "merge", "adds": adds,
        "removes": sorted(touched_set),
        "n_changes": feed.count(),
        "untouched_carried": len([f for f in current if f not in touched_set]),
    })
    return new_v


def merge_compacted(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    key: str,
    payload: Sequence[str],
    order_col: str,
    tiebreak: str,
    op_col: str = "op",
    epoch: int | None = None,
    files: int = 4,
    cluster_by: str | None = None,
) -> int:
    """Copy-on-write merge for a COMPACTED CHANGE-STATE table: the table
    holds one sequence-maximal change record per ever-touched key —
    tombstones INCLUDED (schema: key, op, *payload, order_col,
    tiebreak). Each call folds ``batch`` in by latest-wins, which is
    associative and commutative over (order_col, tiebreak), so any
    batch split in any arrival order converges to the same state (the
    streaming/cdc.py argument, now over manifest-tracked immutable
    files instead of hand-rolled ``v=`` dirs).

    ``epoch`` makes retries exactly-once at the COMMIT level: a replay
    of an epoch already recorded in a manifest is a no-op (the
    checkpoint-recovery contract of foreachBatch sinks). Creates the
    table on first call.
    """
    cols = [key, op_col, *list(payload), order_col, tiebreak]
    from .dedup import latest_wins

    versions = list_versions(root)
    if epoch is not None:
        for v in versions:
            if read_manifest(root, v).get("epoch") == epoch:
                return v
    if not versions:
        merged = latest_wins(batch.select(*cols), key, order_col, tiebreak)
        adds = _write_data(merged, root, 0, files, cluster_by)
        _publish(root, 0, {
            "version": 0, "op": "merge_compacted", "adds": adds,
            "removes": [], "n_changes": batch.count(), "epoch": epoch,
            "cluster_by": cluster_by,
        })
        return 0
    new_v = versions[-1] + 1
    cb = read_manifest(root, 0).get("cluster_by")
    cur = read_version(spark, root).withColumn("_tf_file", F.input_file_name())
    rel = F.regexp_extract(
        "_tf_file", re.escape(os.path.abspath(root)) + "/(.*)$", 1
    )
    cur = cur.withColumn("_tf_file", rel)
    keys = batch.select(F.col(key)).distinct()
    touched = [
        r[0]
        for r in cur.join(F.broadcast(keys), key, "left_semi")
        .select("_tf_file").distinct().collect()
    ]
    base_rows = cur.filter(
        F.col("_tf_file").isin(touched) if touched else F.lit(False)
    ).select(*cols)
    merged = latest_wins(
        base_rows.unionByName(batch.select(*cols)), key, order_col, tiebreak
    )
    adds = _write_data(merged, root, new_v, files, cb)
    _publish(root, new_v, {
        "version": new_v, "op": "merge_compacted", "adds": adds,
        "removes": sorted(touched), "n_changes": batch.count(),
        "epoch": epoch,
    })
    return new_v


def compact(
    spark: SparkSession, root: str, files: int = 1
) -> int:
    """OPTIMIZE: rewrite the CURRENT snapshot into ``files`` files per
    cluster value (or ``files`` total, unclustered) as one commit that
    removes every previously-active file — bin-packing the small files
    merges/appends accumulate. Pure layout change: the snapshot's rows
    are bit-identical before and after (pinned by test), history stays
    time-travelable until vacuumed. The table-format twin of the
    reference's VACUUM/maintenance pass (Maintenance.sql:134-137) and
    of plans/layout.py's compaction entry, now manifest-committed."""
    versions = list_versions(root)
    new_v = versions[-1] + 1
    cb = read_manifest(root, 0).get("cluster_by")
    current = sorted(active_files(root))
    snap = read_version(spark, root)
    adds = _write_data(snap, root, new_v, files, cb)
    _publish(root, new_v, {
        "version": new_v, "op": "compact", "adds": adds,
        "removes": current, "n_changes": 0,
    })
    return new_v


def vacuum(root: str, keep_versions: int = 1) -> list[str]:
    """Delete data files unreferenced by the last ``keep_versions``
    committed snapshots (time travel older than that is sacrificed —
    the retention trade every real format documents). Returns deleted
    relative paths."""
    versions = list_versions(root)
    retained = versions[-keep_versions:]
    live: set[str] = set()
    for v in retained:
        live |= set(active_files(root, v))
    deleted = []
    for vdir in glob.glob(os.path.join(root, "data", "v=*")):
        for p in glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True):
            relp = os.path.relpath(p, root)
            if relp not in live:
                os.unlink(p)
                deleted.append(relp)
    return sorted(deleted)


def history(root: str) -> list[dict]:
    return [read_manifest(root, v) for v in list_versions(root)]
