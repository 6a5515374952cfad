"""Streaming MERGE into the table format (r8): folding a shuffled
multi-batch CDC feed through epoch-stamped COW commits must serve a
snapshot BIT-IDENTICAL to the one-shot batch apply — including deletes,
cross-batch out-of-order changes, checkpoint-recovery reruns — and every
epoch must be a readable historical version."""

from __future__ import annotations

import glob
import random
import shutil

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
    rng = random.Random(11)
    rows = []
    for seq in range(1, 31):
        k = rng.randrange(12)
        op = rng.choice(["I", "U", "D"])
        rows.append((k, op, f"v{seq}", seq * 100, seq, seq))
    rng.shuffle(rows)  # arrival order != sequence order
    return rows


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


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
    TS.run_stream_merge_into_table(stream, root, spark, "k", _PAYLOAD, "seq", "tie")


def test_stream_merge_equals_batch_apply(spark, tmp_path):
    rows = _feed_rows()
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "table")
    base = _base(spark)

    _land(spark, tmp_path, src, rows[:10], "a")
    _land(spark, tmp_path, src, rows[10:20], "b")
    _run(spark, src, root)
    _land(spark, tmp_path, src, rows[20:], "c")
    _run(spark, src, root)  # checkpoint recovery: only file c is new

    feed_all = spark.createDataFrame(rows, _FEED_SCHEMA)
    want = _snap(apply_change_feed(base, feed_all, "k", _PAYLOAD, "seq", "tie"))
    got = _snap(
        TS.read_table_snapshot(spark, base, root, "k", _PAYLOAD, "seq", "tie")
    )
    assert got == want

    # a rerun with nothing new mints no new version and changes nothing
    n_versions = len(tf.list_versions(root))
    _run(spark, src, root)
    assert len(tf.list_versions(root)) == n_versions
    assert _snap(
        TS.read_table_snapshot(spark, base, root, "k", _PAYLOAD, "seq", "tie")
    ) == want


def test_epoch_versions_are_time_travelable(spark, tmp_path):
    """Each micro-batch is a manifest version: the snapshot as of
    version v must equal the batch apply of exactly the feed prefix the
    first v+1 epochs contained."""
    rows = _feed_rows()
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "table")
    base = _base(spark)
    chunks = [rows[:10], rows[10:20], rows[20:]]
    for i, ch in enumerate(chunks):
        _land(spark, tmp_path, src, ch, f"f{i}")
    _run(spark, src, root)

    versions = tf.list_versions(root)
    assert len(versions) == 3
    for i, v in enumerate(versions):
        prefix = [r for ch in chunks[: i + 1] for r in ch]
        want = _snap(
            apply_change_feed(
                base, spark.createDataFrame(prefix, _FEED_SCHEMA),
                "k", _PAYLOAD, "seq", "tie",
            )
        )
        got = _snap(
            TS.read_table_snapshot(
                spark, base, root, "k", _PAYLOAD, "seq", "tie", version=v
            )
        )
        assert got == want, f"version {v} (epoch {i}) snapshot drifted"


def test_epoch_replay_is_noop(spark, tmp_path):
    """merge_compacted with an epoch already in a manifest must return
    the existing version and write nothing (the foreachBatch retry
    contract)."""
    root = str(tmp_path / "table")
    batch = spark.createDataFrame(
        [(1, "I", "x", 1, 1, 1), (2, "I", "y", 2, 2, 2)], _FEED_SCHEMA
    )
    v0 = tf.merge_compacted(spark, root, batch, "k", _PAYLOAD, "seq", "tie", epoch=5)
    v_again = tf.merge_compacted(spark, root, batch, "k", _PAYLOAD, "seq", "tie", epoch=5)
    assert (v0, v_again) == (0, 0)
    assert tf.list_versions(root) == [0]


def test_merge_compacted_converges_for_any_split(spark, tmp_path):
    """Latest-wins associativity, exercised: the SAME shuffled feed cut
    into 1, 2, 3 and 5 micro-batches (boundaries misaligned with
    sequence order) must fold to identical table state every time."""
    rows = _feed_rows()
    base = _base(spark)
    want = None
    for n_splits, tag in ((1, "a"), (2, "b"), (3, "c"), (5, "d")):
        root = str(tmp_path / f"t{tag}")
        size = -(-len(rows) // n_splits)
        for e, i in enumerate(range(0, len(rows), size)):
            batch = spark.createDataFrame(rows[i : i + size], _FEED_SCHEMA)
            tf.merge_compacted(
                spark, root, batch, "k", _PAYLOAD, "seq", "tie", epoch=e
            )
        got = _snap(
            TS.read_table_snapshot(spark, base, root, "k", _PAYLOAD, "seq", "tie")
        )
        if want is None:
            want = got
        assert got == want, f"{n_splits}-way split diverged"


def test_merge_compacted_empty_batch_is_a_version_without_drift(spark, tmp_path):
    """An empty micro-batch (a trigger that found no files) commits a
    version whose state is unchanged — no row loss, no resurrection."""
    root = str(tmp_path / "t")
    rows = _feed_rows()[:10]
    b1 = spark.createDataFrame(rows, _FEED_SCHEMA)
    tf.merge_compacted(spark, root, b1, "k", _PAYLOAD, "seq", "tie", epoch=0)
    before = _snap(tf.read_version(spark, root))
    empty = spark.createDataFrame([], _FEED_SCHEMA)
    v = tf.merge_compacted(spark, root, empty, "k", _PAYLOAD, "seq", "tie", epoch=1)
    assert v == 1
    assert _snap(tf.read_version(spark, root)) == before
