"""Streaming record linkage (r7): a CRM record stream linked against
the customer dimension per micro-batch must produce exactly the batch
operator's verdicts, for any batch split, including across a
checkpoint-recovery rerun."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.linkage import (
    link_crm_records,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.entity_resolution import (
    _crm_extract,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    read_table,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.streaming import (
    er as SER,
)

from .conftest import SF_ORACLE


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_linkage_equals_batch(spark, tmp_path):
    customer = read_table(spark, SF_ORACLE, "customer")
    crm_all = _crm_extract(spark, SF_ORACLE)

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "linked")

    def land(df, name):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(f"{stage}/part-*.parquet")[0], str(src / f"{name}.parquet")
        )

    def run():
        stream = (
            spark.readStream.schema(crm_all.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        SER.run_linkage_stream(stream, customer, out)

    # split the CRM feed across three files / two runs (checkpoint
    # recovery in between) — the union must equal the one-shot answer
    land(crm_all.filter(F.col("crm_id") % 3 == 0), "a")
    land(crm_all.filter(F.col("crm_id") % 3 == 1), "b")
    run()
    land(crm_all.filter(F.col("crm_id") % 3 == 2), "c")
    run()  # only file c is new after recovery

    want = _snap(
        link_crm_records(crm_all, customer).select(
            "crm_id", "matched_customer_key", "match_distance", "matched"
        )
    )
    got = _snap(SER.read_linkage(spark, out))
    assert got == want
    assert len(got) > 0
    # non-vacuous on BOTH verdicts at the oracle SF
    assert any(r[3] for r in got) and any(not r[3] for r in got)
