"""Streaming incremental near-dup dedup (r7 — the 12th streaming
surface): arriving document batches probe the PERSISTED corpus MinHash
band index per micro-batch, emitting verified batch×corpus near-dup
pairs — the continuously-ingesting twin of the batch entry
``dedup_incremental_minhash``.

Per micro-batch the work is exactly the batch operator
(operators/dedup.py::incremental_minhash_near_dups): shingle/sign ONLY
the batch, LSH-probe the stored bands (corpus side is a columnar scan,
never re-shingled for the probe), signature-agreement prefilter, exact
Jaccard verify against candidate-matched corpus docs. Each doc's pairs
depend only on that doc and the (static) corpus, so the per-epoch
outputs are independent and the union over any batch split equals the
one-shot batch answer — no cross-batch state at all, which is why this
surface needs foreachBatch only for the sink, not for merging.

Exactly-once under retries: epoch outputs land in ``epoch_id=<n>``
partitions via dynamic partition overwrite (the gold-sink discipline,
streaming/events.py::run_gold_delta_sink) — a replayed batch replaces
itself.

At 100 TB: the band table is bucketed on (band_idx, bh) so every
micro-batch's probe is exchange-free on the corpus side; corpus text is
touched only for candidate-matched docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import incremental_minhash_near_dups


def run_incremental_minhash_stream(
    batch_stream: DataFrame,
    corpus: DataFrame,
    corpus_bands: DataFrame,
    corpus_sigs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    n_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> None:
    """Consume a stream of document batches; write verified
    (doc_a = batch doc, doc_b = corpus doc, jaccard) pairs per epoch."""

    def probe(batch: DataFrame, epoch_id: int) -> None:
        pairs = incremental_minhash_near_dups(
            batch, corpus, id_col, text_col,
            k=k, n_hashes=n_hashes, bands=bands, threshold=threshold,
            corpus_bands=corpus_bands, corpus_sigs=corpus_sigs,
        ).withColumn("epoch_id", F.lit(int(epoch_id)))
        (
            pairs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_path)
        )

    q = (
        batch_stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_path + "_chk")
        .start()
    )
    q.awaitTermination()


def read_near_dup_pairs(spark: SparkSession, out_path: str) -> DataFrame:
    """All pairs found so far, epoch partitioning dropped."""
    return spark.read.parquet(out_path).select("doc_a", "doc_b", "jaccard")
