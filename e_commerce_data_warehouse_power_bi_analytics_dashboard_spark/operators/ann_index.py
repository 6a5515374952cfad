"""ANN index lifecycle: TRAIN once, persist, SERVE many (r7).

A real 100 TB ANN deployment never retrains its quantizers inside a
query: the coarse centroids, PQ codebooks, corpus codes and bucket
assignments are built in an offline indexing job, persisted, and every
query is a pure scan over those artifacts (FAISS's train()/add()/search()
lifecycle; Jégou et al. 2011 §V assumes exactly this split). Before r7
the three PQ catalog entries paid full codebook training per execution —
correct, but the benched numbers conflated index-build cost with the
serve cost a user actually experiences per query.

This module is the indexing job. ``build_ann_index`` trains every
artifact the PQ family needs with the SAME deterministic machinery the
inline path used (operators/similarity.py::pq_fit_codebooks /
pq_encode / assign_centroids — min-id seeding, 6-decimal mean re-sync,
empty-cluster carry-forward), writes them as parquet under the
gitignored ``.scratch/`` root, and marks success atomically (marker
written last; a torn build is rebuilt, never trusted). Because training
is deterministic and parquet round-trips doubles exactly, a query over
the PERSISTED index is bit-identical to the from-scratch derivation —
which is what keeps the three serve entries hash-matching their
unchanged DuckDB oracles, and what ``ann_index_build_manifest`` checks
mechanically (integer checksums of every artifact vs an oracle that
re-derives them from scratch).

Artifacts (all thin — the vectors themselves are NOT part of the index;
PQ's point is that 4 one-byte codes replace the 64-float vector):

  coarse.parquet     (centroid_id, cv double[])       nlist rows
  assign.parquet     (vid, centroid_id)               N rows, 2 ints
  books_raw.parquet  (subspace, centroid_id, cv)      m*k rows
  codes_raw.parquet  (vid, subspace, code)            m*N rows, 3 ints
  books_res.parquet  (subspace, centroid_id, cv)      m*k rows (residual)
  codes_res.parquet  (vid, subspace, code)            m*N rows (residual)

Scale shape of the build: one corpus-wide coarse assignment (broadcast
centroids, map-side argmax), 2m subspace k-means fits over thin slices,
every write partition-parallel. At 100 TB the build is the one job that
touches raw vectors; everything after reads integers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import read_table
from .similarity import assign_centroids, pq_fit_codebooks, pq_encode
from ..functions.vectors import s_to_double

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

#: bump when any training/encoding rule changes — stale on-disk
#: artifacts from an older recipe must never serve a newer query.
#: (v2: added the bucket-partitioned codes_ivf layout)
ANN_INDEX_VERSION = "v2"

#: index hyper-parameters — shared with plans/llm_ops.py's PQ entries
#: and baked into the DuckDB oracles (m subspaces × k codewords,
#: Lloyd's iters, embedding dim, coarse-centroid selection rule).
PQ_M, PQ_K, PQ_ITERS, PQ_DIM = 4, 8, 2, 64
COARSE_RULE = "vec_id % 50 = 0"

ARTIFACTS = (
    "coarse", "assign", "books_raw", "codes_raw", "books_res", "codes_res",
    "codes_ivf",
)

#: (applicationId, sf_dir) pairs whose index is known good this session
_BUILT: set[tuple[str, str]] = set()


def index_root(sf_dir: str) -> str:
    return os.path.join(
        _REPO_ROOT, ".scratch", f"ann_index_{ANN_INDEX_VERSION}",
        os.path.basename(sf_dir.rstrip("/")),
    )


def _marker(root: str) -> str:
    return os.path.join(root, "_INDEX_COMPLETE")


def build_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Train and persist every PQ-family artifact for ``sf_dir``.

    Idempotent per (session, sf_dir); across processes the completion
    marker short-circuits the rebuild (training is deterministic, so a
    finished index is valid for any process on the same inputs).
    """
    root = index_root(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BUILT:
        return root
    if os.path.exists(_marker(root)):
        _BUILT.add(key)
        return root

    emb = read_table(spark, sf_dir, "embeddings")
    coarse_src = emb.filter(COARSE_RULE)

    def _write(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(root, name))

    # coarse centroids (double-widened once, at index time)
    _write(
        coarse_src.select(
            F.col("vec_id").alias("centroid_id"),
            F.expr(s_to_double("embedding")).alias("cv"),
        ),
        "coarse",
    )
    # corpus bucket assignment — thin (vid, centroid_id)
    a_full = assign_centroids(emb, coarse_src)
    _write(a_full.select("vid", "centroid_id"), "assign")

    # raw-subvector codebooks + codes (the flat-ADC / IVFFlat-style path)
    books_raw = pq_fit_codebooks(emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS, dim=PQ_DIM)
    _write(books_raw, "books_raw")
    codes_raw = pq_encode(emb, books_raw, PQ_M, PQ_DIM)
    _write(codes_raw, "codes_raw")
    # the classical IVF LIST-FILE layout: the same codes, physically
    # clustered by coarse bucket (hive-partitioned on centroid_id) so a
    # bucket probe is a PARTITION-PRUNED scan — at 100 TB this is the
    # difference between touching nprobe/nlist of the index and all of
    # it. A layout of codes_raw, not new training output: its content
    # is pinned by ann_ivfpq_partitioned_scan hash-matching the same
    # oracle as the unpartitioned scan.
    stored_codes = spark.read.parquet(os.path.join(root, "codes_raw"))
    stored_assign = spark.read.parquet(os.path.join(root, "assign"))
    (
        stored_codes.join(stored_assign, "vid")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(root, "codes_ivf"))
    )

    # residual codebooks + codes (IVFADC, Jégou §V.A; dot metric —
    # zero residuals are cosine-undefined, see ivfpq_residual_topk)
    cents = coarse_src.select(
        F.col("vec_id").alias("centroid_id"),
        F.expr(s_to_double("embedding")).alias("cv"),
    )
    er = (
        a_full.join(F.broadcast(cents), "centroid_id")
        .select(
            F.col("vid").alias("vec_id"),
            F.expr("zip_with(v, cv, (a, b) -> a - b)").alias("embedding"),
        )
    )
    books_res = pq_fit_codebooks(
        er, m=PQ_M, k=PQ_K, iters=PQ_ITERS, dim=PQ_DIM, metric="dot"
    )
    _write(books_res, "books_res")
    _write(pq_encode(er, books_res, PQ_M, PQ_DIM, metric="dot"), "codes_res")

    with open(_marker(root), "w") as fh:
        fh.write("ok\n")
    _BUILT.add(key)
    return root


def read_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One persisted artifact as a DataFrame (builds the index first if
    this (session, sf_dir) hasn't)."""
    if name not in ARTIFACTS:
        raise ValueError(f"unknown ANN index artifact {name!r}")
    root = build_ann_index(spark, sf_dir)
    return spark.read.parquet(os.path.join(root, name))
