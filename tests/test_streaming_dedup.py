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
