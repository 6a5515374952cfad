"""Distributed linear-classifier training over embedding columns.

A training-data pipeline needs a *quality classifier* (fastText/LR-style:
score documents, keep the high-quality tail — the GPT-3/CCNet curation
recipe). This module trains a binary logistic-regression model with
full-batch gradient descent as a pure DataFrame program, following the
same iterative-algorithm discipline as ``similarity.kmeans_fit``:

- a bounded driver loop of ``iters`` rounds; per round ONE distributed
  pass over the data (broadcast weights, map-side sigmoid/error) plus
  ONE thin dimension-keyed shuffle (``dim + 1`` groups) for the gradient,
- the (1-row) weight frame is ``localCheckpoint``ed per round to cut
  lineage,
- the updated weights are rounded to 6 decimals at every iteration
  boundary, which re-synchronizes float reduction order so the whole fit
  is reproducible run-to-run AND cross-engine: the catalog entries
  (plans/classifier_queries.py) hash-match a DuckDB oracle that unrolls
  the same recurrence as chained CTEs.

Scale shape (100 TB): the per-round cost is one scan of the corpus with
map-side partial aggregation into ``dim + 1`` gradient cells — the
shuffle payload is O(partitions × dim) scalars regardless of row count,
and the weight state is a single broadcast row. No all-pairs work, no
driver-side data movement beyond the (dim+1)-double weight vector.

Reference parity: the reference warehouse has no ML trainer; this is a
beyond-reference LLM-pipeline surface (SURVEY.md "training-data
pipeline" mandate), designed Spark-first rather than ported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def lr_fit(
    emb: DataFrame,
    iters: int = 4,
    lr: float = 0.5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_expr: str = "CAST(label % 2 AS DOUBLE)",
) -> DataFrame:
    """Full-batch gradient-descent logistic regression -> one row
    ``(w: array<double>[dim], b: double)``.

    Update rule (both engines, bit-synchronized by the rounding):

        p_i   = 1 / (1 + exp(-(b + w . x_i)))
        g_j   = avg_i(x_ij * (p_i - y_i));   g_b = avg_i(p_i - y_i)
        w_j  <- round(w_j - lr * g_j, 6);    b  <- round(b - lr * g_b, 6)

    The dot product uses the same sequential ``zip_with``/``aggregate``
    fold as the ANN path (functions/vectors.py::s_dot), which matches
    DuckDB's ``list_dot_product`` loop order — so the only cross-engine
    float divergence is reduction order in the avg (~1e-14), absorbed by
    the 6-decimal round exactly as in ``kmeans_fit``.

    The bias gradient rides the SAME shuffle as the weight gradient:
    after posexplode every per-dimension group contains one error value
    per input row, so ``avg(err)`` within any group IS the bias
    gradient — no second pass over the data.
    """
    from .similarity import _round_half_up_6

    spark = emb.sparkSession
    vecs = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(V.s_to_double(vec_col)).alias("v"),
        F.expr(label_expr).alias("y"),
    ).localCheckpoint(eager=True)
    # r12 (guide §1.2 "per-round fixed costs" — numbers in
    # OPTIMIZATION_r12.md): the weight state is metadata-grain (dim+1
    # doubles — the old per-round BroadcastExchange collected exactly
    # these values to the driver before re-shipping them), so it now
    # lives in the driver: each round is ONE distributed
    # scan+posexplode+65-cell-agg job with the weights inlined as an
    # array literal, replacing the old localCheckpoint job + broadcast
    # job + weight-rebuild agg per round. The per-row expression text
    # (same s_dot fold, same sigmoid) and the distributed avg are
    # unchanged, so the walked weight trajectory is identical; the
    # driver-side update uses the same HALF_UP 6-decimal round
    # (_round_half_up_6) as F.round.
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        scored = vecs.withColumns(
            {"w": F.array(*[F.lit(x) for x in w]), "b": F.lit(b)}
        ).select(
            "v",
            (
                F.expr(f"1.0 / (1.0 + exp(-(b + {V.s_dot('w', 'v')})))")
                - F.col("y")
            ).alias("err"),
        )
        dims = scored.select("err", F.posexplode("v").alias("pos", "val"))
        # one (dim+1)-cell shuffle: per-dim weight gradient avg(val*err)
        # plus the bias gradient avg(err) (identical value in every
        # group — each group holds exactly one err per input row)
        grads = dims.groupBy("pos").agg(
            F.avg(F.col("val") * F.col("err")).alias("g"),
            F.avg("err").alias("gb"),
        ).collect()
        if not grads:
            # empty input (r12 advisory): no gradient groups at all —
            # keep the current weights instead of raising on min([])
            break
        g = [0.0] * dim
        for r in grads:
            g[r["pos"]] = r["g"]
        # min() over the per-group gb copies: they differ only in
        # reduction order (~1e-16), re-synced by the same 6-decimal
        # round as the weights — matches the old F.min("gb") exactly
        gb = min(r["gb"] for r in grads)
        w = [_round_half_up_6(w[p] - lr * g[p]) for p in range(dim)]
        b = _round_half_up_6(b - lr * gb)
    # numPartitions=1: the default spark.range spreads its single row
    # over defaultParallelism partitions, turning every downstream
    # broadcast of the model into a cores-wide empty task wave (r12)
    return spark.range(0, 1, 1, numPartitions=1).select(
        F.array(*[F.lit(x) for x in w]).alias("w"), F.lit(b).alias("b")
    )


def lr_score(
    emb: DataFrame,
    model: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_expr: str = "CAST(label % 2 AS DOUBLE)",
) -> DataFrame:
    """Score every row with a trained ``(w, b)`` model -> (vid, y, p,
    pred). The probability is rounded to 6 decimals BEFORE the 0.5
    threshold so the engine and the oracle agree on every borderline
    row whenever they agree to 6 decimals (the invariant the training
    rounding already guarantees). Map-side only: broadcast 1-row model,
    no shuffle."""
    return (
        emb.select(
            F.col(id_col).alias("vid"),
            F.expr(V.s_to_double(vec_col)).alias("v"),
            F.expr(label_expr).alias("y"),
        )
        .crossJoin(F.broadcast(model))
        .select(
            "vid",
            "y",
            F.round(
                F.expr(f"1.0 / (1.0 + exp(-(b + {V.s_dot('w', 'v')})))"), 6
            ).alias("p"),
        )
        .withColumn("pred", (F.col("p") >= F.lit(0.5)).cast("double"))
    )


def lr_fit_serial(
    rows: list[tuple[list[float], float]],
    iters: int = 4,
    lr: float = 0.5,
    dim: int = 64,
) -> tuple[list[float], float]:
    """Pure-Python serial twin of :func:`lr_fit` (same recurrence, same
    6-decimal rounding) for the property tests — mirrors the
    PageRank/graph serial-twin pattern. ``rows`` = [(vector, y), ...]."""
    import math

    w = [0.0] * dim
    b = 0.0
    n = len(rows)
    for _ in range(iters):
        gw = [0.0] * dim
        gb = 0.0
        for v, y in rows:
            dot = b
            for j in range(dim):
                dot += w[j] * v[j]
            err = 1.0 / (1.0 + math.exp(-dot)) - y
            for j in range(dim):
                gw[j] += v[j] * err
            gb += err
        w = [round(w[j] - lr * gw[j] / n, 6) for j in range(dim)]
        b = round(b - lr * gb / n, 6)
    return w, b
