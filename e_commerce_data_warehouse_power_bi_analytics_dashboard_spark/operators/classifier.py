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
    vecs = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(V.s_to_double(vec_col)).alias("v"),
        F.expr(label_expr).alias("y"),
    ).localCheckpoint(eager=True)
    spark = emb.sparkSession
    wf = spark.range(1).select(
        F.expr(f"array_repeat(CAST(0 AS DOUBLE), {dim})").alias("w"),
        F.lit(0.0).alias("b"),
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        scored = vecs.crossJoin(F.broadcast(wf)).select(
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
        )
        old = wf.select(F.posexplode("w").alias("pos", "wv"), "b")
        newd = old.join(grads, "pos").select(
            "pos",
            F.round(F.col("wv") - F.lit(lr) * F.col("g"), 6).alias("nw"),
            "b",
            "gb",
        )
        wf = (
            newd.groupBy()
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, nw))), x -> x.nw)"
                ).alias("w"),
                # min() over per-group copies of b / gb: b is constant;
                # gb copies differ only in reduction order (~1e-16),
                # re-synced by the same 6-decimal round as the weights
                F.round(F.min("b") - F.lit(lr) * F.min("gb"), 6).alias("b"),
            )
            .localCheckpoint(eager=True)
        )
    return wf


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
