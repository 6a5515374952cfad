"""ANN index train/serve split (r7): the serve-time scans over the
persisted index must be bit-identical to the train-inline derivation
(training is deterministic and parquet round-trips doubles exactly),
and the build must be idempotent (marker short-circuit — a second call
never retrains)."""

from __future__ import annotations

import os

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    ann_index as IX,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
    similarity as S,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    read_table,
)

from .conftest import SF_SMOKE

_M, _K, _ITERS, _DIM = IX.PQ_M, IX.PQ_K, IX.PQ_ITERS, IX.PQ_DIM
_PRED = "vec_id < 10"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_build_is_idempotent_and_marked(spark):
    root = IX.build_ann_index(spark, SF_SMOKE)
    assert os.path.exists(os.path.join(root, "_INDEX_COMPLETE"))
    for name in IX.ARTIFACTS:
        assert os.path.isdir(os.path.join(root, name)), name
    mtime = os.path.getmtime(os.path.join(root, "_INDEX_COMPLETE"))
    assert IX.build_ann_index(spark, SF_SMOKE) == root
    assert os.path.getmtime(os.path.join(root, "_INDEX_COMPLETE")) == mtime


def test_serve_equals_train_inline_flat_adc(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    books = IX.read_artifact(spark, SF_SMOKE, "books_raw")
    codes = IX.read_artifact(spark, SF_SMOKE, "codes_raw")
    served = S.pq_adc_topk(emb, books, _PRED, k=5, m=_M, dim=_DIM,
                           codes=codes)
    inline_books = S.pq_fit_codebooks(emb, m=_M, k=_K, iters=_ITERS,
                                      dim=_DIM)
    inline = S.pq_adc_topk(emb, inline_books, _PRED, k=5, m=_M, dim=_DIM)
    assert _rows(served) == _rows(inline)


def test_serve_equals_train_inline_ivfpq(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    coarse = emb.filter(IX.COARSE_RULE)
    served = S.ivfpq_adc_topk(
        emb, coarse, IX.read_artifact(spark, SF_SMOKE, "books_raw"),
        _PRED, k=5, m=_M, dim=_DIM,
        assigned=IX.read_artifact(spark, SF_SMOKE, "assign"),
        codes=IX.read_artifact(spark, SF_SMOKE, "codes_raw"),
    )
    inline_books = S.pq_fit_codebooks(emb, m=_M, k=_K, iters=_ITERS,
                                      dim=_DIM)
    inline = S.ivfpq_adc_topk(emb, coarse, inline_books, _PRED,
                              k=5, m=_M, dim=_DIM)
    assert _rows(served) == _rows(inline)


def test_serve_equals_train_inline_residual(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    coarse = emb.filter(IX.COARSE_RULE)
    served = S.ivfpq_residual_topk(
        emb, coarse, _PRED, k=5, m=_M, kk=_K, iters=_ITERS, dim=_DIM,
        assigned=IX.read_artifact(spark, SF_SMOKE, "assign"),
        books=IX.read_artifact(spark, SF_SMOKE, "books_res"),
        codes=IX.read_artifact(spark, SF_SMOKE, "codes_res"),
    )
    inline = S.ivfpq_residual_topk(
        emb, coarse, _PRED, k=5, m=_M, kk=_K, iters=_ITERS, dim=_DIM,
    )
    assert _rows(served) == _rows(inline)


def test_serve_equals_inline_ivf(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    coarse = emb.filter(IX.COARSE_RULE)
    served = S.ivf_topk(emb, coarse, _PRED, k=3,
                        assigned=IX.read_artifact(spark, SF_SMOKE, "assign"))
    inline = S.ivf_topk(emb, coarse, _PRED, k=3)
    assert _rows(served) == _rows(inline)


def test_partitioned_scan_equals_unpartitioned_and_prunes(spark):
    """The list-file layout (codes hive-partitioned on centroid_id) must
    return exactly the unpartitioned serve scan's rows, and its plan
    must carry a dynamic-partition-pruning subquery on centroid_id —
    the probe touches the probed buckets' files, not the whole index."""
    import io
    from contextlib import redirect_stdout

    emb = read_table(spark, SF_SMOKE, "embeddings")
    part = S.ivfpq_partitioned_scan(
        emb,
        IX.read_artifact(spark, SF_SMOKE, "codes_ivf"),
        IX.read_artifact(spark, SF_SMOKE, "books_raw"),
        IX.read_artifact(spark, SF_SMOKE, "assign"),
        _PRED, k=5, m=_M, dim=_DIM,
    )
    flat = S.ivfpq_adc_topk(
        emb, emb.filter(IX.COARSE_RULE),
        IX.read_artifact(spark, SF_SMOKE, "books_raw"),
        _PRED, k=5, m=_M, dim=_DIM,
        assigned=IX.read_artifact(spark, SF_SMOKE, "assign"),
        codes=IX.read_artifact(spark, SF_SMOKE, "codes_raw"),
    )
    assert _rows(part) == _rows(flat)
    buf = io.StringIO()
    with redirect_stdout(buf):
        part.explain(mode="formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan


def test_serve_plan_never_scans_query_vectors_corpus_wide(spark):
    """The serve-time IVF+PQ plan must not contain the corpus-wide
    N×nlist argmax (`max_by` aggregate over a crossJoin with centroids)
    nor a k-means training loop — the index replaces both. The plan
    reads the raw embeddings only to evaluate the query predicate."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    df = S.ivfpq_adc_topk(
        emb, emb.filter(IX.COARSE_RULE),
        IX.read_artifact(spark, SF_SMOKE, "books_raw"),
        _PRED, k=5, m=_M, dim=_DIM,
        assigned=IX.read_artifact(spark, SF_SMOKE, "assign"),
        codes=IX.read_artifact(spark, SF_SMOKE, "codes_raw"),
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "max_by" not in plan
