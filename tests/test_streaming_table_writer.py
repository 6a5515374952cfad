"""Streaming APPEND sink into the table format via the Python Data
Source API (r9): executors stage files + ship footer stats, the driver
publishes one epoch-stamped append manifest per micro-batch — ACID,
exactly-once under checkpoint replay, stats-complete manifests."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    table_format as tf,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming.table_writer import (
    TableAppendDataSource,
    TableAppendStreamWriter,
)

_SCHEMA = "k long, b int, val long"


def _base(spark):
    return spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("b"),
        (F.col("id") * 2).alias("val"),
    )


def _land(spark, tmp_path, src, rows, name):
    stage = str(tmp_path / f"stage_{name}")
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(stage)
    shutil.copy(
        glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet")
    )


def _run_stream(spark, src, root, cp):
    (
        spark.readStream.schema(spark.createDataFrame([], _SCHEMA).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.format("table_append")
        .option("root", root)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_stream_append_commits_per_batch_with_stats(spark, tmp_path):
    spark.dataSource.register(TableAppendDataSource)
    root = str(tmp_path / "tbl")
    cp = str(tmp_path / "cp")
    src = tmp_path / "src"
    src.mkdir()
    tf.create_table(spark, root, _base(spark), files=1)

    _land(spark, tmp_path, src, [(100 + i, 1, i) for i in range(5)], "a")
    _land(spark, tmp_path, src, [(200 + i, 2, i) for i in range(7)], "b")
    _run_stream(spark, src, root, cp)

    h = tf.history(root)
    assert [m["op"] for m in h] == ["create", "append", "append"]
    assert {m.get("epoch") for m in h[1:]} == {0, 1}
    assert sorted(m["n_changes"] for m in h[1:]) == [5, 7]
    # every streamed add carries task-computed footer stats
    for m in h[1:]:
        for a in m["adds"]:
            assert a["rows"] > 0 and "k" in a["stats"]
    snap = tf.read_version(spark, root)
    assert snap.count() == 62
    assert snap.filter(F.col("k") >= 100).count() == 12
    # stats-pruned read over streamed files works like any other commit
    sel, total = tf.snapshot_files(root, None, {"k": (200, 299)})
    assert len(sel) < total


def test_stream_append_checkpoint_replay_is_exactly_once(spark, tmp_path):
    spark.dataSource.register(TableAppendDataSource)
    root = str(tmp_path / "tbl")
    cp = str(tmp_path / "cp")
    src = tmp_path / "src"
    src.mkdir()
    tf.create_table(spark, root, _base(spark), files=1)
    _land(spark, tmp_path, src, [(300, 3, 1)], "a")
    _run_stream(spark, src, root, cp)
    n_versions = len(tf.list_versions(root))
    assert tf.read_version(spark, root).count() == 51

    # rerun with the same checkpoint and nothing new: no commit, no rows
    _run_stream(spark, src, root, cp)
    assert len(tf.list_versions(root)) == n_versions
    assert tf.read_version(spark, root).count() == 51

    # a new file lands exactly once
    _land(spark, tmp_path, src, [(301, 3, 2)], "b")
    _run_stream(spark, src, root, cp)
    assert tf.read_version(spark, root).count() == 52


def test_writer_commit_replay_and_conflict_retry(spark, tmp_path):
    """Unit-level: a duplicate commit(batchId) no-ops even with fresh
    messages; a version claimed by a concurrent writer is retried."""
    root = str(tmp_path / "tbl")
    tf.create_table(spark, root, _base(spark), files=1)
    w = TableAppendStreamWriter({"root": root})
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming.table_writer import (
        FileCommitMessage,
    )
    # stage one real file through the arrow path
    import pyarrow as pa

    batch = pa.RecordBatch.from_pydict({"k": [999], "b": [1], "val": [5]})
    msg = w.write(iter([batch]))
    assert len(msg.files) == 1
    rec = msg.files[0]
    assert rec["path"] and rec["rows"] == 1 and "k" in rec["stats"]
    w.commit([msg], batchId=7)
    assert tf.read_version(spark, root).filter(F.col("k") == 999).count() == 1
    n = len(tf.list_versions(root))
    w.commit([msg], batchId=7)  # replay: no-op
    assert len(tf.list_versions(root)) == n
    # concurrent claim of the next version: the writer must skip past it
    tf._publish(root, n, {"version": n, "op": "append", "adds": [],
                          "removes": [], "n_changes": 0})
    msg2 = w.write(iter([pa.RecordBatch.from_pydict(
        {"k": [1000], "b": [2], "val": [6]}
    )]))
    w.commit([msg2], batchId=8)
    assert tf.read_version(spark, root).filter(F.col("k") == 1000).count() == 1


def test_two_writers_epoch_namespaced_by_writer_id(spark, tmp_path):
    """batchIds restart from 0 per query: two writers with DISTINCT
    writerIds must both land their batch 0 (the review-found silent
    drop), and a same-writer replay still no-ops."""
    import pyarrow as pa

    root = str(tmp_path / "tbl")
    tf.create_table(spark, root, _base(spark), files=1)
    wa = TableAppendStreamWriter({"root": root, "writerid": "qA"})
    wb = TableAppendStreamWriter({"root": root, "writerid": "qB"})
    ma = wa.write(iter([pa.RecordBatch.from_pydict(
        {"k": [900], "b": [1], "val": [1]})]))
    mb = wb.write(iter([pa.RecordBatch.from_pydict(
        {"k": [901], "b": [1], "val": [2]})]))
    wa.commit([ma], batchId=0)
    wb.commit([mb], batchId=0)  # same batchId, different writer: lands
    snap = tf.read_version(spark, root)
    assert snap.filter(F.col("k").isin(900, 901)).count() == 2
    n = len(tf.list_versions(root))
    wa.commit([ma], batchId=0)  # same-writer replay: no-op
    assert len(tf.list_versions(root)) == n
    epochs = [m.get("epoch") for m in tf.history(root)[1:]]
    assert sorted(epochs) == ["qA/0", "qB/0"]


def test_stream_append_follows_partition_spec(spark, tmp_path):
    """Streaming appends to a SPEC-PARTITIONED table land hive-pathed,
    partition-stamped files — one per partition value per task — so
    snapshot_files prunes streamed data by partition exactly like
    batch-written data, and the partition-scoped selective OPTIMIZE
    sees them."""
    spark.dataSource.register(TableAppendDataSource)
    root = str(tmp_path / "ptbl")
    cp = str(tmp_path / "pcp")
    src = tmp_path / "psrc"
    src.mkdir()
    tf.create_table(spark, root, _base(spark), files=1, partition_by="b")
    rows = [(1000 + i, i % 4, i * 5) for i in range(40)]
    _land(spark, tmp_path, src, rows, "a")
    _run_stream(spark, src, root, cp)

    m = tf.read_manifest(root, 1)
    assert m["op"] == "append" and len(m["adds"]) >= 4
    parts = {a["partition"]["b"] for a in m["adds"]}
    assert parts == {"0", "1", "2", "3"}
    assert all("_p_b=" in a["path"] for a in m["adds"])
    assert sum(a["rows"] for a in m["adds"]) == 40
    # partition pruning covers the streamed files
    sel, total = tf.snapshot_files(root, where={"b": (2, 2)})
    assert 0 < len(sel) < total
    streamed_sel = [p for p in sel if "stream-" in p]
    assert streamed_sel and all("_p_b=2" in p for p in streamed_sel)
    got = tf.read_version(spark, root, where={"b": (2, 2)}).filter(
        F.col("b") == 2
    )
    assert got.count() == 50 // 4 + 10  # base b=2 rows + streamed ones
    # rows are intact end-to-end
    assert tf.read_version(spark, root).count() == 90


def test_stream_append_rejects_path_hostile_partition_values(spark, tmp_path):
    """r11 (advisory): the sink builds hive subdirs itself, so a
    partition value containing '/', '=', '%', '\\' or a control char
    would corrupt the path and its _partition_values parse — the task
    REJECTS it before staging anything (extending the null-value
    guard). Exercised executor-side: write() is a pure method over an
    arrow batch."""
    import pyarrow as pa

    root = str(tmp_path / "htbl")
    tf.create_table(
        spark, root,
        spark.createDataFrame([("ok", 1)], "b string, v long"),
        files=1, partition_by="b",
    )
    writer = TableAppendDataSource(options={"root": root}).streamWriter(
        None, overwrite=False
    )
    good = pa.RecordBatch.from_pydict({"b": ["fine"], "v": [7]})
    msg = writer.write(iter([good]))
    assert len(msg.files) == 1 and "_p_b=fine" in msg.files[0]["path"]
    for bad_val in ("a/b", "x=y", "p%2F", "nl\nv"):
        bad = pa.RecordBatch.from_pydict({"b": [bad_val], "v": [1]})
        with pytest.raises(ValueError, match="path-hostile"):
            writer.write(iter([bad]))
    with pytest.raises(ValueError, match="null partition"):
        writer.write(iter([pa.RecordBatch.from_pydict({"b": [None], "v": [1]})]))
