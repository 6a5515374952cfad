"""Streaming CDC apply (r7): folding a shuffled multi-batch change feed
through foreachBatch must yield a snapshot BIT-IDENTICAL to the one-shot
batch apply over the whole feed — including deletes, late cross-batch
out-of-order changes, and checkpoint-recovery reruns."""

from __future__ import annotations

import glob
import random
import shutil

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.cdc import (
    apply_change_feed,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming import (
    cdc as SC,
)

_FEED_SCHEMA = "k long, op string, val string, n long, seq long, tie long"
_PAYLOAD = ["val", "n"]


def _base(spark):
    rows = [(k, f"base{k}", k * 10) for k in range(8)]
    return spark.createDataFrame(rows, "k long, val string, n long")


def _feed_rows():
    """30 shuffled changes over 12 keys: inserts of new keys, updates,
    deletes (some later resurrected by a higher-seq insert), and a
    late LOW-seq delete that must NOT clobber a higher-seq update."""
    rng = random.Random(7)
    rows = []
    seq = 0
    for _ in range(30):
        seq += 1
        k = rng.randrange(12)
        op = rng.choice(["I", "U", "D"])
        rows.append((k, op, f"v{seq}", seq * 100, seq, seq))
    rng.shuffle(rows)  # arrival order != sequence order
    return rows


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_cdc_equals_batch_apply(spark, tmp_path):
    rows = _feed_rows()
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")

    def land(chunk, name):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(chunk, _FEED_SCHEMA).coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet")
        )

    def run():
        stream = (
            spark.readStream.schema(
                spark.createDataFrame([], _FEED_SCHEMA).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        SC.run_cdc_stream_apply(
            stream, state, spark, "k", _PAYLOAD, "seq", "tie"
        )

    base = _base(spark)

    # three micro-batches whose boundaries do not align with sequence
    # order (cross-batch disorder is the point)
    land(rows[:10], "a")
    land(rows[10:20], "b")
    run()
    land(rows[20:], "c")
    run()  # checkpoint recovery: only file c is new

    feed_all = spark.createDataFrame(rows, _FEED_SCHEMA)
    want = _snap(apply_change_feed(base, feed_all, "k", _PAYLOAD, "seq", "tie"))
    got = _snap(
        SC.read_cdc_snapshot(spark, base, state, "k", _PAYLOAD, "seq", "tie")
    )
    assert got == want

    # a rerun with nothing new must change nothing
    run()
    assert _snap(
        SC.read_cdc_snapshot(spark, base, state, "k", _PAYLOAD, "seq", "tie")
    ) == want


def test_stream_cdc_late_old_delete_cannot_clobber(spark, tmp_path):
    """A delete with a LOWER sequence arriving a batch AFTER the update
    it predates must lose — the failure mode sequential snapshot-apply
    would have (module docstring)."""
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")

    def land(chunk, name):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(chunk, _FEED_SCHEMA).coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet")
        )

    def run():
        stream = (
            spark.readStream.schema(
                spark.createDataFrame([], _FEED_SCHEMA).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        SC.run_cdc_stream_apply(
            stream, state, spark, "k", _PAYLOAD, "seq", "tie"
        )

    base = _base(spark)
    land([(1, "U", "newer", 999, 5, 5)], "a")  # seq 5 update arrives first
    run()
    land([(1, "D", None, None, 3, 3)], "b")  # seq 3 delete arrives late
    run()
    got = _snap(
        SC.read_cdc_snapshot(spark, base, state, "k", _PAYLOAD, "seq", "tie")
    )
    assert (1, "newer", 999, "update") in got  # the update survived
    assert not any(r[0] == 1 and r[3] == "base" for r in got)