"""Streaming change-data-feed SOURCE (r9): readStream.format(
"table_changes") over the table format's commit log (PySpark 4 Python
Data Source API) must emit exactly the batch change_feed's rows —
including merge inserts/updates/deletes, merge-on-read vector
pre-images, and nothing for a vector-retiring compact — and a
checkpointed restart must consume only new commits (exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    table_format as tf,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming.table_source import (
    TableChangesDataSource,
)

_PAYLOAD = ["b", "val"]


def _base(spark):
    return spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("b"),
        (F.col("id") * 10).alias("val"),
    )


def _build_table(spark, root):
    """create → merge (I/U/D) → MoR delete → compact: every commit kind
    the feed distinguishes."""
    tf.create_table(spark, root, _base(spark), files=2)
    feed = spark.createDataFrame(
        [
            (3, "U", 3, 999, 1, 0),     # update
            (100, "I", 0, 111, 1, 1),   # insert (new key)
            (7, "D", 3, 70, 1, 2),      # delete
        ],
        "k long, op string, b int, val long, seq int, tb int",
    )
    tf.merge(spark, root, feed, "k", _PAYLOAD, "seq", "tb")
    tf.delete_where(spark, root, "k % 10 = 4")  # MoR vectors
    tf.compact(spark, root, files=1)            # retires vectors, no changes


def _register(spark):
    spark.dataSource.register(TableChangesDataSource)


def _collect_stream(spark, root, out, cp):
    (
        spark.readStream.format("table_changes")
        .option("root", root)
        .option("key", "k")
        .option("payload", ",".join(_PAYLOAD))
        .load()
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", cp)
        .start(out)
        .awaitTermination()
    )
    return spark.read.parquet(out)


def _snap(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "k", *_PAYLOAD, "_change_type", "_commit_version"
        ).collect()
    )


def test_stream_change_feed_equals_batch(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _build_table(spark, root)
    _register(spark)
    got = _snap(
        _collect_stream(
            spark, root, str(tmp_path / "out"), str(tmp_path / "cp")
        )
    )
    want = _snap(
        tf.change_feed(spark, root, "k", _PAYLOAD, v_from=0).withColumn(
            "_commit_version", F.col("_commit_version").cast("int")
        )
    )
    assert got == want
    # sanity against vacuous equality: all three change kinds present,
    # the MoR delete commit contributed its vectored pre-images, and
    # the compact contributed nothing
    kinds = {(r[3], r[4]) for r in got}
    assert ("insert", 1) in kinds and ("update_postimage", 1) in kinds
    assert ("delete", 1) in kinds and ("delete", 2) in kinds
    assert not any(v == 3 for _, v in kinds)
    mor_deleted = sorted(r[0] for r in got if r[4] == 2)
    assert mor_deleted == [4, 14, 24, 34]


def test_stream_checkpoint_resumes_with_only_new_commits(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _build_table(spark, root)
    _register(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    first = _snap(_collect_stream(spark, root, out, cp))

    # new commits after the first run: an append and another MoR delete
    extra = spark.createDataFrame(
        [(200, 0, 7)], "k long, b int, val long"
    )
    tf.append(spark, root, extra, files=1)
    tf.delete_where(spark, root, "k = 3")

    second = _snap(_collect_stream(spark, root, out, cp))
    new_rows = [r for r in second if r not in first]
    assert len(second) == len(first) + len(new_rows)
    assert {(r[0], r[3]) for r in new_rows} == {
        (200, "insert"), (3, "delete"),
    }
    # and the cumulative stream still equals the cumulative batch feed
    want = _snap(
        tf.change_feed(spark, root, "k", _PAYLOAD, v_from=0).withColumn(
            "_commit_version", F.col("_commit_version").cast("int")
        )
    )
    assert second == want


def test_stream_start_version_skips_history(spark, tmp_path):
    """startVersion=2 must surface only commits > 2 (the 'subscribe
    from here' contract a downstream consumer pins after a backfill)."""
    root = str(tmp_path / "tbl")
    _build_table(spark, root)
    tf.delete_where(spark, root, "k = 5")  # v4
    _register(spark)
    out, cp = str(tmp_path / "out2"), str(tmp_path / "cp2")
    (
        spark.readStream.format("table_changes")
        .option("root", root)
        .option("key", "k")
        .option("payload", ",".join(_PAYLOAD))
        .option("startVersion", "2")
        .load()
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", cp)
        .start(out)
        .awaitTermination()
    )
    got = _snap(spark.read.parquet(out))
    assert {r[4] for r in got} == {4}
    assert [r[0] for r in got] == [5]


def test_max_commits_per_trigger_admission_contract(spark, tmp_path):
    """Unit-level admission contract of maxCommitsPerTrigger (pacing
    shapes processingTime triggers; availableNow in the Python Data
    Source API captures one end offset and cannot observe per-trigger
    limits — documented): each latestOffset() admits at most N
    committed versions past the last planned end, and a checkpoint
    restart (partitions() called before any initialOffset) re-seeds
    the floor from the restart's start offset."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming.table_source import (
        TableChangesStreamReader,
    )

    root = str(tmp_path / "tbl")
    tf.create_table(spark, root, _base(spark), files=1)
    for k in (100, 101, 102, 103):
        tf.append(
            spark,
            root,
            spark.createDataFrame([(k, 0, k)], "k long, b int, val long"),
            files=1,
        )
    opts = {"root": root, "key": "k", "payload": ",".join(_PAYLOAD),
            "maxcommitspertrigger": "1"}
    r = TableChangesStreamReader(opts)
    assert r.initialOffset() == {"version": 0}
    # trigger 1: admit exactly one commit past the floor
    end1 = r.latestOffset()
    assert end1 == {"version": 1}
    parts = r.partitions({"version": 0}, end1)
    assert [p.version for p in parts] == [1]
    # trigger 2: floor advanced by partitions()
    end2 = r.latestOffset()
    assert end2 == {"version": 2}
    r.partitions(end1, end2)
    # no new commits beyond the backlog: drains one per trigger
    assert r.latestOffset() == {"version": 3}
    # checkpoint restart: fresh reader, no initialOffset — first
    # latestOffset is unthrottled (documented restart burst), then the
    # first partitions() call re-seeds the floor
    r2 = TableChangesStreamReader(opts)
    assert r2.latestOffset() == {"version": 4}
    r2.partitions({"version": 2}, {"version": 3})
    assert r2.latestOffset() == {"version": 4}
    r2.partitions({"version": 3}, {"version": 4})
    assert r2.latestOffset() == {"version": 4}  # caught up
    # unthrottled reader admits everything at once
    r3 = TableChangesStreamReader({k: v for k, v in opts.items()
                                   if k != "maxcommitspertrigger"})
    r3.initialOffset()
    assert r3.latestOffset() == {"version": 4}


def test_stream_change_feed_classifies_merge_mor(spark, tmp_path):
    """A streaming-MoR merge commit (vector pre-images + I/U image
    append in ONE commit) must stream as insert / update_postimage /
    delete — matching the batch change_feed, never delete+insert pairs
    for an updated key."""
    root = str(tmp_path / "tblmor")
    tf.create_table(spark, root, _base(spark), files=2)
    batch = spark.createDataFrame(
        [
            (200, "I", 1, 222, 1, 0),  # fresh key -> insert
            (5, "U", 1, 555, 1, 1),    # existing  -> update_postimage
            (6, "D", 2, 60, 1, 2),     # existing  -> delete
        ],
        "k long, op string, b int, val long, seq int, tb int",
    )
    v = tf.merge_mor(spark, root, batch, "k", _PAYLOAD, "seq", "tb")
    _register(spark)
    got = _snap(
        _collect_stream(
            spark, root, str(tmp_path / "outm"), str(tmp_path / "cpm")
        )
    )
    want = _snap(
        tf.change_feed(spark, root, "k", _PAYLOAD, v_from=0).withColumn(
            "_commit_version", F.col("_commit_version").cast("int")
        )
    )
    assert got == want
    by_key = {r[0]: r[3] for r in got if r[4] == v}
    assert by_key == {
        200: "insert", 5: "update_postimage", 6: "delete",
    }
