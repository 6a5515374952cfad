"""Similarity search over embedding columns (LLM-data-pipeline
extensions; BASELINE.json north star).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the corpus — a single pass over the embeddings, fully
parallel, no shuffle except the final per-query top-k (TakeOrdered on k
rows per query after a window filter). The scale path is IVF: assign
every vector to its nearest coarse centroid once (a broadcast of the
centroid table), then search only the query's bucket — at 100 TB with
nlist=√N centroids this cuts the scan per query by ~√N while staying a
plain DataFrame plan (bucket equi-join, partition-prunable if the corpus
is written partitioned by centroid id — plans/layout.py).

All math is JVM-side double folds (functions/vectors.py) — bit-identical
to the DuckDB oracle; a numpy/Pandas-UDF variant only pays off when the
query batch is large enough to amortize Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import s_cosine, s_to_double


def _with_dvec(emb: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias(out_id), F.expr(s_to_double(vec_col)).alias(out_vec)
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``emb`` (self excluded).

    Returns (query_id, neighbor_id, rank, score), rank 1..k by
    (score desc, neighbor_id) — fully deterministic.
    """
    corpus = _with_dvec(emb, id_col, vec_col, "neighbor_id", "nv")
    qs = _with_dvec(queries, id_col, vec_col, "query_id", "qv")
    scored = (
        corpus.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(s_cosine("qv", "nv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def assign_centroids(
    emb: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector
    (cosine, deterministic tiebreak on centroid id). One broadcast join +
    one window over ncentroids rows per vector."""
    vecs = _with_dvec(emb, id_col, vec_col, "vid", "v")
    cents = _with_dvec(centroids, id_col, vec_col, "centroid_id", "cv")
    w = Window.partitionBy("vid").orderBy(
        F.desc(F.col("cos")), F.asc("centroid_id")
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select("vid", "v", "centroid_id", F.expr(s_cosine("v", "cv")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("vid"), "v", "centroid_id")
    )


def ivf_topk(
    emb: DataFrame, centroids: DataFrame, query_pred: str, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding", nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: search the query's ``nprobe`` nearest centroid
    buckets (nprobe=1 = classic IVF; higher nprobe trades scan volume for
    recall — the standard knob at scale).

    ``query_pred`` is a SQL predicate over the id column selecting the
    query set (kept as a predicate so the assignment pass is shared).
    The predicate is always applied on a frame that still carries the
    original ``id_col`` name — never via string surgery on the predicate
    text, which would corrupt any predicate where the id name occurs as
    a substring of another identifier or inside a literal.
    """
    assigned = assign_centroids(emb, centroids, id_col, vec_col)
    if nprobe <= 1:
        # evaluate the predicate on the ORIGINAL frame (it may reference
        # any emb column), then semi-join the ids into the assignment
        q_ids = emb.filter(F.expr(query_pred)).select(F.col(id_col).alias("vid"))
        qs = assigned.join(F.broadcast(q_ids), "vid").select(
            F.col("vid").alias("query_id"), F.col("v").alias("qv"), F.col("centroid_id")
        )
    else:
        vecs = _with_dvec(emb.filter(F.expr(query_pred)), id_col, vec_col, "vid", "v")
        cents = _with_dvec(centroids, id_col, vec_col, "centroid_id", "cv")
        w = Window.partitionBy("vid").orderBy(F.desc(F.col("cos")), F.asc("centroid_id"))
        qs = (
            vecs.crossJoin(F.broadcast(cents))
            .select("vid", "v", "centroid_id", F.expr(s_cosine("v", "cv")).alias("cos"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= nprobe)
            .select(F.col("vid").alias("query_id"), F.col("v").alias("qv"), "centroid_id")
        )
    scored = (
        assigned.join(F.broadcast(qs), "centroid_id")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("neighbor_id"), F.expr(s_cosine("qv", "v")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def similar_pairs(
    emb: DataFrame, threshold: float, block_col: str = "label",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocking groups.

    Blocking (label / coarse-centroid / LSH bucket) keeps the self-join
    quadratic only within blocks — the standard all-pairs guard at scale.
    """
    base = emb.select(
        F.col(id_col), F.col(block_col).alias("blk"), F.expr(s_to_double(vec_col)).alias("v")
    )
    a = base.select(F.col(id_col).alias("id_a"), "blk", F.col("v").alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), "blk", F.col("v").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr(s_cosine("va", "vb")).alias("score"))
        .filter(F.col("score") >= threshold)
    )
