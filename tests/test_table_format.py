"""Table-format invariants the oracle entries can't express: file-level
copy-on-write, commit atomicity/conflict, snapshot immutability, vacuum
retention. The data-level correctness of the same table is pinned by the
three tf_* catalog entries (tests/test_catalog_oracle.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    table_format as tf,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.cdc import (
    apply_change_feed,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import (
    table_format_queries as tfq,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def demo_root(spark):
    return tfq.ensure_demo_table(spark, SF_SMOKE)


def _bucket_of(relpath: str) -> int:
    for part in relpath.split(os.sep):
        if part.startswith("_pk="):
            return int(part.split("=", 1)[1])
    raise AssertionError(f"no _pk= component in {relpath}")


def test_cow_rewrites_only_touched_buckets(spark, demo_root):
    """Feed 1 touches buckets {1 (U %8==1), 0 (I %8==4)}; feed 2 touches
    {3 (D %16==3), 1 (U %16==5)}. Bucket-2 files must survive BOTH
    merges by reference — the copy-on-write property."""
    h = tf.history(demo_root)
    assert [m["op"] for m in h] == ["create", "merge", "merge"]
    assert {_bucket_of(f) for f in h[1]["removes"]} <= {0, 1}
    assert {_bucket_of(f) for f in h[1]["adds"]} <= {0, 1}
    assert {_bucket_of(f) for f in h[2]["removes"]} <= {1, 3}
    assert {_bucket_of(f) for f in h[2]["adds"]} <= {1, 3}
    bucket2_v0 = {f for f in h[0]["adds"] if _bucket_of(f) == 2}
    assert bucket2_v0, "base must have bucket-2 files"
    assert bucket2_v0 <= set(tf.active_files(demo_root)), (
        "bucket-2 files must be carried forward untouched"
    )


def test_snapshot_equals_serial_change_feed_replay(spark, demo_root):
    """read_version(2) == apply_change_feed(apply_change_feed(v0, feed1),
    feed2) — the table format adds file bookkeeping, never row drift."""
    cust = tfq._with_bucket(
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    )
    base = cust.filter(F.col("c_custkey") % 4 != 0).select(
        "c_custkey", *tfq._PAYLOAD
    )
    s1 = apply_change_feed(
        base, tfq._feed1(cust), "c_custkey", tfq._PAYLOAD, "seq", "tb"
    ).select("c_custkey", *tfq._PAYLOAD)
    s2 = apply_change_feed(
        s1, tfq._feed2(cust), "c_custkey", tfq._PAYLOAD, "seq", "tb"
    ).select("c_custkey", *tfq._PAYLOAD)
    got = sorted(map(tuple, tf.read_version(spark, demo_root)
                     .select("c_custkey", *tfq._PAYLOAD).collect()))
    want = sorted(map(tuple, s2.collect()))
    assert got == want


def test_time_travel_versions_immutable(spark, demo_root):
    """v0 read after two merges == the original base — committed
    versions never change."""
    n0 = tf.read_version(spark, demo_root, 0).count()
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    assert n0 == cust.filter(F.col("c_custkey") % 4 != 0).count()
    v0_files = tf.active_files(demo_root, 0)
    assert all(f.startswith(os.path.join("data", "v=0")) for f in v0_files)


def test_commit_conflict_second_writer_loses(demo_root, tmp_path):
    root = str(tmp_path / "t")
    tf._publish(root, 0, {"version": 0, "op": "create", "adds": [],
                          "removes": [], "n_changes": 0})
    with pytest.raises(tf.CommitConflict):
        tf._publish(root, 0, {"version": 0, "op": "create", "adds": [],
                              "removes": [], "n_changes": 0})
    # the losing attempt leaves no temp debris
    assert os.listdir(tf._commit_dir(root)) == ["00000000.json"]


def test_vacuum_keeps_latest_drops_history(spark, demo_root, tmp_path):
    root = str(tmp_path / "vac")
    shutil.copytree(demo_root, root)
    before = tf.read_version(spark, root).count()
    latest_live = set(tf.active_files(root))
    deleted = tf.vacuum(root, keep_versions=1)
    assert deleted, "two merges must strand at least one rewritten file"
    assert not latest_live & set(deleted)
    for relp in deleted:
        assert not os.path.exists(os.path.join(root, relp))
    assert tf.read_version(spark, root).count() == before


def test_append_commits_remove_nothing(spark):
    """INSERT-INTO commits add files only; every prior file stays live
    (nothing for vacuum to reclaim at latest)."""
    root = tfq.ensure_evo_table(spark, SF_SMOKE)
    h = tf.history(root)
    assert [m["op"] for m in h] == ["create", "append"]
    assert h[1]["removes"] == [] and h[1]["adds"]
    assert set(tf.active_files(root)) == set(h[0]["adds"]) | set(h[1]["adds"])


def test_evolved_append_nulls_only_on_old_rows(spark):
    """merge_schema read: the new column is NULL exactly on
    pre-evolution rows."""
    from pyspark.sql import functions as F

    root = tfq.ensure_evo_table(spark, SF_SMOKE)
    df = tf.read_version(spark, root, merge_schema=True)
    bad = df.filter(
        (F.col("loyalty_tier").isNull()) != (F.col("c_custkey") % 4 != 0)
    ).count()
    assert bad == 0


def test_compact_preserves_rows_and_unifies_files(spark, demo_root, tmp_path):
    """OPTIMIZE: post-compaction snapshot is row-identical; every
    previously-active file is removed from the manifest (still on disk
    for time travel until vacuum); active files shrink to one per
    cluster value."""
    root = str(tmp_path / "opt")
    shutil.copytree(demo_root, root)
    before = sorted(map(tuple, tf.read_version(spark, root).collect()))
    pre_active = set(tf.active_files(root))
    v = tf.compact(spark, root)
    after = sorted(map(tuple, tf.read_version(spark, root).collect()))
    assert after == before
    m = tf.read_manifest(root, v)
    assert set(m["removes"]) == pre_active
    post = tf.active_files(root)
    assert len(post) <= 4 and all(f.startswith(f"data{os.sep}v={v}") for f in post)
    # history before the compaction is still readable
    assert tf.read_version(spark, root, 0).count() > 0
    # and vacuum now reclaims every pre-compaction file
    deleted = tf.vacuum(root, keep_versions=1)
    assert pre_active <= set(deleted)
    assert sorted(map(tuple, tf.read_version(spark, root).collect())) == before


def test_concurrent_writers_exactly_one_commit_wins(spark, demo_root, tmp_path):
    """Optimistic concurrency under a REAL race: N threads publish the
    same next version concurrently; exactly one manifest lands, every
    loser gets CommitConflict, and no temp debris survives."""
    import threading

    root = str(tmp_path / "race")
    tf._publish(root, 0, {"version": 0, "op": "create", "adds": [],
                          "removes": [], "n_changes": 0})
    results = []
    barrier = threading.Barrier(8)

    def writer(i):
        barrier.wait()
        try:
            tf._publish(root, 1, {"version": 1, "op": "merge",
                                  "adds": [f"w{i}"], "removes": [],
                                  "n_changes": i})
            results.append(("ok", i))
        except tf.CommitConflict:
            results.append(("conflict", i))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(1 for r, _ in results if r == "ok") == 1
    assert sum(1 for r, _ in results if r == "conflict") == 7
    assert sorted(os.listdir(tf._commit_dir(root))) == [
        "00000000.json", "00000001.json"
    ]
    winner = [i for r, i in results if r == "ok"][0]
    assert tf.read_manifest(root, 1)["adds"] == [f"w{winner}"]
