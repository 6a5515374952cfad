"""Streaming MERGE-ON-READ into the table format (r10 — verdict #8):
each micro-batch lands as one vector-delete + append commit. The served
snapshot must equal the serial per-batch apply_change_feed fold (the
row-store contract: within-batch latest-wins, cross-batch arrival
order), checkpoint replays must be exactly-once, every epoch must be
time-travelable, and the change-feed source must classify the commit's
rows as insert / update_postimage / delete — not delete+insert pairs."""

from __future__ import annotations

import glob
import random
import shutil

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    table_format as tf,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.cdc import (
    apply_change_feed,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming import (
    table_sink as TS,
)

_FEED_SCHEMA = "k long, op string, val string, n long, seq long, tie long"
_PAYLOAD = ["val", "n"]


def _base(spark):
    rows = [(k, f"base{k}", k * 10) for k in range(8)]
    return spark.createDataFrame(rows, "k long, val string, n long")


def _feed_rows():
    rng = random.Random(23)
    rows = []
    for seq in range(1, 31):
        k = rng.randrange(12)
        op = rng.choice(["I", "U", "D"])
        rows.append((k, op, f"v{seq}", seq * 100, seq, seq))
    return rows  # sequence-ordered arrival (the merge_mor contract)


def _snap(df):
    return sorted(tuple(r) for r in df.select("k", *_PAYLOAD).collect())


def _land(spark, tmp_path, src, chunk, name):
    stage = str(tmp_path / f"stage_{name}")
    spark.createDataFrame(chunk, _FEED_SCHEMA).coalesce(1).write.parquet(stage)
    shutil.copy(
        glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet")
    )


def _run(spark, src, root):
    stream = (
        spark.readStream.schema(spark.createDataFrame([], _FEED_SCHEMA).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    TS.run_stream_mor_merge(stream, root, spark, "k", _PAYLOAD, "seq", "tie")


def _serial_fold(spark, base, chunks):
    state = base
    for ch in chunks:
        state = apply_change_feed(
            state, spark.createDataFrame(ch, _FEED_SCHEMA),
            "k", _PAYLOAD, "seq", "tie",
        ).select("k", *_PAYLOAD)
    return state


def test_stream_mor_equals_serial_batch_fold(spark, tmp_path):
    rows = _feed_rows()
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "table")
    tf.create_table(spark, root, _base(spark), files=2)

    chunks = [rows[:10], rows[10:20], rows[20:]]
    _land(spark, tmp_path, src, chunks[0], "a")
    _land(spark, tmp_path, src, chunks[1], "b")
    _run(spark, src, root)
    _land(spark, tmp_path, src, chunks[2], "c")
    _run(spark, src, root)  # checkpoint recovery: only file c is new

    want = _snap(_serial_fold(spark, _base(spark), chunks))
    assert _snap(tf.read_version(spark, root)) == want

    # a rerun with nothing new mints no new version and changes nothing
    n_versions = len(tf.list_versions(root))
    _run(spark, src, root)
    assert len(tf.list_versions(root)) == n_versions
    assert _snap(tf.read_version(spark, root)) == want


def test_mor_epochs_time_travelable_and_vectored(spark, tmp_path):
    rows = _feed_rows()
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "table")
    tf.create_table(spark, root, _base(spark), files=2)
    chunks = [rows[:10], rows[10:20], rows[20:]]
    for i, ch in enumerate(chunks):
        _land(spark, tmp_path, src, ch, f"f{i}")
    _run(spark, src, root)

    versions = tf.list_versions(root)
    assert len(versions) == 4  # create + 3 epochs
    for i, v in enumerate(versions[1:]):
        want = _snap(_serial_fold(spark, _base(spark), chunks[: i + 1]))
        assert _snap(tf.read_version(spark, root, v)) == want, f"v{v}"

    # write shape: every epoch commit is merge-on-read — vectors and/or
    # whole-file removes plus an image append, never a table rewrite
    base_files = set(tf.active_files(root, 0))
    for v in versions[1:]:
        m = tf.read_manifest(root, v)
        assert m["op"] == "merge_mor"
        assert m.get("delete_adds") or m["removes"] or m["adds"]
    # at least one base file must survive all three epochs by reference
    assert base_files & set(tf.active_files(root)), (
        "MoR commits must carry untouched base files, not rewrite them"
    )


def test_change_feed_classifies_mor_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(0, "a", 0), (1, "b", 10), (2, "c", 20)], "k long, val string, n long"
    )
    tf.create_table(spark, root, base, files=1)
    batch = spark.createDataFrame(
        [
            (9, "I", "new", 90, 1, 1),   # fresh key -> insert
            (1, "U", "upd", 11, 1, 1),   # existing  -> update_postimage
            (2, "D", "c", 20, 1, 1),     # existing  -> delete
        ],
        _FEED_SCHEMA,
    )
    v = tf.merge_mor(spark, root, batch, "k", _PAYLOAD, "seq", "tie")
    feed = tf.change_feed(spark, root, "k", _PAYLOAD, v_from=v - 1, v_to=v)
    got = {
        r["k"]: (r["_change_type"], r["val"], r["n"]) for r in feed.collect()
    }
    assert got == {
        9: ("insert", "new", 90),
        1: ("update_postimage", "upd", 11),
        2: ("delete", "c", 20),
    }
    # exactly-once: replaying the same epoch mints no version
    v2 = tf.merge_mor(
        spark, root, batch, "k", _PAYLOAD, "seq", "tie", epoch=7
    )
    assert tf.merge_mor(
        spark, root, batch, "k", _PAYLOAD, "seq", "tie", epoch=7
    ) == v2
