"""Multimodal operator tests: payload/metadata schema, Arrow batch
plumbing, frame arithmetic, the ASCII invariant the oracles rely on,
and the codec-stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    multimodal as MM,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    read_table,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def payloads(spark):
    return MM.attach_payload(read_table(spark, SF_SMOKE, "documents")).cache()


def test_payload_schema(payloads):
    schema = dict((f.name, f.dataType) for f in payloads.schema.fields)
    assert isinstance(schema["payload"], T.BinaryType)
    got = [(f.name, f.dataType) for f in schema["meta"].fields]
    want = [(f.name, f.dataType) for f in MM.METADATA_TYPE.fields]
    assert got == want


def test_ascii_invariant(payloads, spark):
    """The DuckDB oracles equate chars with bytes; assert it holds."""
    docs = read_table(spark, SF_SMOKE, "documents")
    n = docs.filter(F.octet_length(F.encode("text", "UTF-8")) != F.length("text")).count()
    assert n == 0


def test_feature_extract_matches_local_hash(payloads):
    feats = {r["doc_id"]: r for r in MM.extract_features(payloads).collect()}
    sample = payloads.limit(20).collect()
    assert len(sample) == 20
    for row in sample:
        b = bytes(row["payload"])
        f = feats[row["doc_id"]]
        assert f["byte_len"] == len(b)
        assert f["sha256"] == hashlib.sha256(b).hexdigest()
        assert f["magic"] == b[:4].hex()
        assert 0.0 < f["byte_entropy"] <= 8.0


def test_frame_sample_covers_every_kth(payloads):
    frames = MM.sample_frames(payloads, frame_size=100, every=3)
    agg = frames.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("max_idx")
    )
    joined = payloads.select(
        "doc_id", F.octet_length("payload").alias("blen")
    ).join(agg, "doc_id")
    for r in joined.collect():
        n_frames = (r["blen"] + 99) // 100
        expected = (n_frames + 2) // 3  # ceil(n_frames / 3)
        assert r["n"] == expected
        assert r["max_idx"] % 3 == 0


def test_frame_idx_multiples(payloads):
    bad = MM.sample_frames(payloads).filter(F.col("frame_idx") % 4 != 0).count()
    assert bad == 0


def test_decode_stub_raises(payloads):
    with pytest.raises(NotImplementedError):
        MM.decode_image(payloads)
    with pytest.raises(NotImplementedError):
        MM.resize_image(payloads, 32, 32)
