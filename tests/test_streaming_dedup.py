"""Streaming incremental MinHash dedup (r7): a document stream probing
the persisted corpus band index per micro-batch must produce exactly
the batch entry's pairs, for any batch split, including across a
checkpoint-recovery rerun."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    dedup as D,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    minhash_index as MI,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming import (
    dedup as SD,
)

from .conftest import SF_ORACLE


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_probe_equals_batch(spark, tmp_path):
    corpus = MI.corpus_docs(spark, SF_ORACLE)
    batch_all = MI.batch_docs(spark, SF_ORACLE)
    bands = MI.read_artifact(spark, SF_ORACLE, "bands")
    sigs = MI.read_artifact(spark, SF_ORACLE, "sigs")

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "pairs")

    def land(df, name):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet")
        )

    def run():
        stream = (
            spark.readStream.schema(batch_all.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        SD.run_incremental_minhash_stream(stream, corpus, bands, sigs, out)

    # split the arriving batch across three files / two runs (recovery
    # in between) — the union must equal the one-shot batch answer
    land(batch_all.filter(F.col("doc_id") % 3 == 0), "a")
    land(batch_all.filter(F.col("doc_id") % 3 == 1), "b")
    run()
    land(batch_all.filter(F.col("doc_id") % 3 == 2), "c")
    run()  # checkpoint recovery: only file c is new

    want = _snap(
        D.incremental_minhash_near_dups(
            batch_all, corpus, "doc_id", "text",
            corpus_bands=bands, corpus_sigs=sigs,
        )
    )
    got = _snap(SD.read_near_dup_pairs(spark, out))
    assert got == want
    assert len(got) > 0  # non-vacuous at the oracle SF


def test_online_fold_probe_stream_equals_sequential_batch(spark, tmp_path):
    """The full online lifecycle (r12 — verdict #7): every micro-batch
    probes the index as folded SO FAR (bootstrap corpus + all earlier
    epochs), folds itself in, and triggers the re-bucket compaction on
    the file-count threshold — so the stream's pairs must equal the
    sequential batch twin pairs(B1×C) ∪ pairs(B2×(C∪B1)) ∪
    pairs(B3×(C∪B1∪B2)), including across a checkpoint-recovery rerun
    and with compaction firing between folds."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.minhash_index import (
        IncrMinhashIndex,
    )

    corpus = MI.corpus_docs(spark, SF_ORACLE)
    slices = [
        MI.batch_slice_docs(spark, SF_ORACLE, g)
        for g in range(1, MI.N_FOLD_GENS + 1)
    ]

    tbl = "minhash_bands_online_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}_compact")
    index = IncrMinhashIndex(str(tmp_path / "onidx"), tbl)
    out = str(tmp_path / "pairs")
    online = SD.OnlineMinhashDedup(
        spark, index, out, compact_files_per_bucket=1
    )
    try:
        online.bootstrap(corpus)

        src = tmp_path / "src"
        src.mkdir()

        def land(df, name):
            stage = str(tmp_path / f"stage_{name}")
            df.coalesce(1).write.parquet(stage)
            shutil.copy(
                glob.glob(f"{stage}/part-*.parquet")[0],
                str(src / f"{name}.parquet"),
            )

        def run():
            stream = (
                spark.readStream.schema(corpus.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            online.run(stream)

        land(slices[0], "a")
        land(slices[1], "b")
        run()
        # compaction policy fired: never more than threshold+1 files
        # per bucket right after a fold, and ≤ threshold after compact
        assert max(index.files_per_bucket().values()) == 1
        land(slices[2], "c")
        run()  # checkpoint recovery: only file c is new

        # the sequential batch twin — each slice against everything
        # accepted before it
        want = []
        grown = corpus
        for s in slices:
            want += _snap(
                D.incremental_minhash_near_dups(s, grown, "doc_id", "text")
            )
            grown = grown.unionByName(s)
        got = _snap(
            spark.read.parquet(out).select("doc_a", "doc_b", "jaccard")
        )
        assert got == sorted(want)
        assert len(got) > 0  # non-vacuous at the oracle SF
        # the folded index now holds corpus + every epoch
        n_all = grown.count()
        assert index.sigs(spark).count() == n_all
        assert index.attach_bands(spark).count() == n_all * MI.BANDS
        # epoch replay after a completed fold is a wholesale no-op
        state_before = sorted(index.files_per_bucket().items())
        online.process_epoch(slices[2], 2)
        assert sorted(index.files_per_bucket().items()) == state_before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_compact")
