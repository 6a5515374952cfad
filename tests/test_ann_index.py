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

# ------------------------------------------- r11/r12: incremental K-fold


def _tree_state(path):
    out = {}
    for dirpath, _, files in os.walk(path):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, path)] = (
                os.path.getmtime(p), os.path.getsize(p)
            )
    return out


def test_incr_kfold_appends_only_slice_sized_deltas(
    spark, tmp_path, monkeypatch
):
    """The K-fold scale contract, pinned at file level (VERDICT r11
    #2): each fold generation writes ONLY its own _b<gen> delta dirs
    (sized by its slice), and never touches a base byte OR an earlier
    generation's files — at 100 TB every fold costs its batch, not the
    corpus. Also pins the marker short-circuit, manifest growth, and
    that the fully-folded read unions to the full corpus."""
    monkeypatch.setattr(
        IX, "incr_index_root", lambda sf: str(tmp_path / "incr")
    )
    saved = set(IX._INCR_BUILT)
    IX._INCR_BUILT.clear()
    try:
        root = IX.build_incr_base(spark, SF_SMOKE)
        frozen = ("coarse", "books_raw")
        watched = list(IX._INCR_FOLDED) + list(frozen)
        n_batch = IX.batch_embeddings(spark, SF_SMOKE).count()
        n_all = read_table(spark, SF_SMOKE, "embeddings").count()
        assert n_batch > 0
        slice_ns = [
            IX.batch_slice_embeddings(spark, SF_SMOKE, g).count()
            for g in range(1, IX.N_FOLD_GENS + 1)
        ]
        assert sum(slice_ns) == n_batch  # slices partition the batch
        state = {
            n: _tree_state(os.path.join(root, n)) for n in watched
        }
        for g in range(1, IX.N_FOLD_GENS + 1):
            IX._fold_one_gen(spark, SF_SMOKE, root, g)
            # nothing previously written moved
            for n, st in state.items():
                assert _tree_state(os.path.join(root, n)) == st, (
                    f"fold g{g} touched {n}"
                )
            # this generation's delta is sized by its slice
            assert spark.read.parquet(
                os.path.join(root, f"assign_b{g}")
            ).count() == slice_ns[g - 1]
            for a in IX._INCR_FOLDED:
                d = f"{a}_b{g}"
                assert d in IX.read_layout(root)[a]
                state[d] = _tree_state(os.path.join(root, d))
        # marker short-circuit: a full fold call is now a no-op
        assert IX.fold_incr_batch(spark, SF_SMOKE) == root
        for n, st in state.items():
            assert _tree_state(os.path.join(root, n)) == st
        # folded read = union corpus
        assert IX.read_incr_artifact(spark, SF_SMOKE, "assign").count() == n_all
        assert IX.read_incr_artifact(
            spark, SF_SMOKE, "codes_raw").count() == IX.PQ_M * n_all
    finally:
        IX._INCR_BUILT.clear()
        IX._INCR_BUILT.update(saved)


def test_incr_fold_assignments_use_frozen_centroids(spark, tmp_path, monkeypatch):
    """Folded batch assignments (union over ALL K generations) must
    equal assigning the whole batch to the BASE coarse centroids
    (quantizers frozen — no retrain), and the frozen centroid set must
    be corpus-only (no batch member ever becomes a centroid, however
    many folds run)."""
    monkeypatch.setattr(
        IX, "incr_index_root", lambda sf: str(tmp_path / "incr2")
    )
    saved = set(IX._INCR_BUILT)
    IX._INCR_BUILT.clear()
    try:
        root = IX.fold_incr_batch(spark, SF_SMOKE)
        coarse = spark.read.parquet(os.path.join(root, "coarse"))
        batch_ids = {
            r[0] for r in IX.batch_embeddings(spark, SF_SMOKE)
            .select("vec_id").collect()
        }
        cent_ids = {r[0] for r in coarse.select("centroid_id").collect()}
        assert not (cent_ids & batch_ids)
        from pyspark.sql import functions as F

        expected = S.assign_centroids(
            IX.batch_embeddings(spark, SF_SMOKE),
            coarse.select(
                F.col("centroid_id").alias("vec_id"),
                F.col("cv").alias("embedding"),
            ),
        ).select("vid", "centroid_id")
        got = None
        for g in range(1, IX.N_FOLD_GENS + 1):
            part = spark.read.parquet(os.path.join(root, f"assign_b{g}"))
            got = part if got is None else got.unionByName(part)
        assert _rows(got) == _rows(expected)
    finally:
        IX._INCR_BUILT.clear()
        IX._INCR_BUILT.update(saved)


def test_incr_compaction_merges_generations_without_retraining(
    spark, tmp_path, monkeypatch
):
    """The full K-fold lifecycle: fold K=3 → compact → fold state
    preserved. Compaction merges every generation into fresh _c dirs
    behind ONE atomic manifest flip — row-identical artifacts (the
    quantizers are frozen, nothing is recomputed), replaced dirs
    garbage-collected, second call a no-op, and orphan dirs from a
    simulated crash are GC'd on the next pass."""
    monkeypatch.setattr(
        IX, "incr_index_root", lambda sf: str(tmp_path / "incr3")
    )
    saved = set(IX._INCR_BUILT)
    IX._INCR_BUILT.clear()
    try:
        root = IX.fold_incr_batch(spark, SF_SMOKE)
        before = {
            a: _rows(IX.read_incr_artifact(spark, SF_SMOKE, a))
            for a in IX.INCR_ARTIFACTS
        }
        layout0 = IX.read_layout(root)
        assert all(
            len(layout0[a]) == 1 + IX.N_FOLD_GENS for a in IX._INCR_FOLDED
        )
        # under-threshold: policy knob says don't compact yet
        assert IX.compact_incr_ann(
            spark, SF_SMOKE, max_dirs_per_artifact=IX.N_FOLD_GENS + 1
        ) == 0
        retired = IX.compact_incr_ann(spark, SF_SMOKE)
        assert retired == len(IX._INCR_FOLDED) * (1 + IX.N_FOLD_GENS)
        layout1 = IX.read_layout(root)
        for a in IX._INCR_FOLDED:
            assert layout1[a] == [f"{a}_c1"]
            # replaced dirs are gone from disk
            for d in layout0[a]:
                assert not os.path.exists(os.path.join(root, d)), d
        # row-identical across the flip — frozen quantizers, no retrain
        for a in IX.INCR_ARTIFACTS:
            assert _rows(
                IX.read_incr_artifact(spark, SF_SMOKE, a)
            ) == before[a], a
        # fold markers survive: a fold call after compaction re-folds
        # nothing (the batches are IN the index, just relocated)
        assert IX.fold_incr_batch(spark, SF_SMOKE) == root
        assert IX.read_layout(root) == layout1
        # second compaction: nothing above threshold
        assert IX.compact_incr_ann(spark, SF_SMOKE) == 0
        # crash-sim: an orphan delta dir (written, never committed to
        # the manifest) is swept by the next maintenance pass
        orphan = os.path.join(root, "assign_b9")
        os.makedirs(orphan)
        IX._gc_unreferenced(root)
        assert not os.path.exists(orphan)
    finally:
        IX._INCR_BUILT.clear()
        IX._INCR_BUILT.update(saved)


def test_incr_fold_recall_drift_trend_across_generations(
    spark, tmp_path, monkeypatch
):
    """The K-fold recall-drift TREND (r12 — verdict #2): after each
    fold generation, appended-arm IVF recall@3 over the queries folded
    so far is a well-defined, publishable number — the time series a
    real deployment watches to schedule the retrain. Pins: the query
    set grows with each generation, every prefix recall is a valid
    ratio, and the K=3 value equals the catalog audit entry's
    'appended' arm at the same scale (the trend ENDS at the number the
    oracle-checked entry publishes)."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.llm_ops import (
        _INCR_QPRED,
        ann_index_append_recall_audit,
    )
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        read_table as _rt,
    )
    from pyspark.sql import functions as F

    from .conftest import SF_ORACLE

    monkeypatch.setattr(
        IX, "incr_index_root", lambda sf: str(tmp_path / "incr_trend")
    )
    saved = set(IX._INCR_BUILT)
    IX._INCR_BUILT.clear()
    try:
        root = IX.build_incr_base(spark, SF_ORACLE)
        emb = _rt(spark, SF_ORACLE, "embeddings")
        coarse = spark.read.parquet(os.path.join(root, "coarse")).select(
            F.col("centroid_id").alias("vec_id"), F.col("cv").alias("embedding")
        )
        trend = []
        assigned = spark.read.parquet(os.path.join(root, "assign"))
        folded_pred = "FALSE"
        for g in range(1, IX.N_FOLD_GENS + 1):
            IX._fold_one_gen(spark, SF_ORACLE, root, g)
            assigned = assigned.unionByName(
                spark.read.parquet(os.path.join(root, f"assign_b{g}"))
            )
            folded_pred = (
                f"({folded_pred}) OR (({IX.S_EMB_SLICE}) = {g - 1})"
            )
            qpred = f"({_INCR_QPRED}) AND ({folded_pred})"
            queries = emb.filter(qpred)
            nq = queries.count()
            exact = S.brute_force_topk(emb, queries, k=3).select(
                "query_id", "neighbor_id"
            )
            approx = S.ivf_topk(
                emb, coarse, qpred, k=3, assigned=assigned
            ).select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
            hits = (
                exact.join(approx, ["query_id", "neighbor_id"], "left")
                .agg(F.sum(F.coalesce("hit", F.lit(0)))).collect()[0][0]
            )
            recall = hits / (3 * nq) if nq else None
            trend.append((nq, recall))
        # the query set grows monotonically and every recall is valid
        nqs = [nq for nq, _ in trend]
        assert nqs == sorted(nqs) and nqs[-1] > nqs[0]
        for nq, r in trend:
            if nq:
                assert 0.0 <= r <= 1.0
        # the trend ends at the audit entry's published appended arm
        audit = {
            row.path: row for row in
            ann_index_append_recall_audit(spark, SF_ORACLE).collect()
        }
        assert nqs[-1] == audit["appended"].n_queries
        assert abs(trend[-1][1] - audit["appended"].recall_at_3) < 1e-12
    finally:
        IX._INCR_BUILT.clear()
        IX._INCR_BUILT.update(saved)
