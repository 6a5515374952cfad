"""Streaming record linkage (r7 — the 13th streaming surface): arriving
CRM record batches are linked against the customer dimension per
micro-batch — the continuously-ingesting twin of the batch entry
``er_customer_linkage``.

Per micro-batch the work is exactly the batch operator
(operators/linkage.py::link_crm_records): band-block the batch's
records, probe the dimension, composite-rank the candidates. Each
record's best match depends only on that record and the (static)
dimension, so per-epoch outputs are independent and the union over any
batch split equals the one-shot batch answer — no cross-batch state,
foreachBatch is needed only for the sink.

Exactly-once under retries: epoch outputs land in ``epoch_id=<n>``
partitions via dynamic partition overwrite (the gold-sink discipline,
streaming/events.py::run_gold_delta_sink) — a replayed batch replaces
itself.

At 100 TB: the dimension side is a columnar scan keyed by the blocking
band; pre-bucketing the dimension on ``bid`` makes every micro-batch's
probe exchange-free on the dimension side (the corpus-bands discipline
of streaming/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linkage import link_crm_records


def run_linkage_stream(
    crm_stream: DataFrame,
    customer: DataFrame,
    out_path: str,
) -> None:
    """Consume a stream of CRM record batches; write each record's
    link verdict (matched key, distance, matched flag) per epoch."""

    def probe(batch: DataFrame, epoch_id: int) -> None:
        linked = link_crm_records(batch, customer).withColumn(
            "epoch_id", F.lit(int(epoch_id))
        )
        (
            linked.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_path)
        )

    q = (
        crm_stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_path + "_chk")
        .start()
    )
    q.awaitTermination()


def read_linkage(spark: SparkSession, out_path: str) -> DataFrame:
    """All link verdicts so far, epoch partitioning dropped."""
    return spark.read.parquet(out_path).select(
        "crm_id", "matched_customer_key", "match_distance", "matched"
    )
