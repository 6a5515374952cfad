"""Persisted MinHash-LSH corpus index: the near-dup twin of the ANN
train/serve split (r7, verdict item #4).

A continuously-ingesting training pipeline dedups every arriving batch
against the standing corpus. The EXACT-hash path needs only a
fingerprint table; the NEAR-dup path needs the corpus's MinHash band
signatures — which are expensive to derive (tokenize → shingle → 32
permutations) and INVARIANT for already-ingested documents. So a real
100 TB pipeline computes them once per document at ingest and stores
them; each new batch re-derives only ITS OWN signatures and LSH-probes
the stored bands: new×corpus candidates, never corpus×corpus, and the
corpus side is a columnar scan (no re-shingling).

This module persists exactly those two artifacts for the catalog's
batch/corpus split of the documents table (the same deterministic
hash-coin the exact incremental entry uses):

  bands.parquet  (doc, band_idx, bh)   — the LSH probe table; at scale
                                         bucketed on (band_idx, bh) so
                                         batch probes are exchange-free
  sigs.parquet   (doc, sig long[])     — for the signature-agreement
                                         prefilter before exact verify

Same lifecycle discipline as operators/ann_index.py: versioned root
under gitignored ``.scratch/``, completion marker written last, derived
deterministically so persisted == recomputed (the equivalence test and
the entry's from-scratch DuckDB oracle both pin this).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import o_md5_long, s_md5_long
from ..sources.tpch import read_table
from .dedup import band_rows, minhash_signatures_from_shingles, shingle_set

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

MINHASH_INDEX_VERSION = "v1"

#: index hyper-parameters (match dedup_minhash_lsh's banding)
N_HASHES, BANDS, SHINGLE_K = 32, 16, 2

#: the incremental-batch coin: stable per-doc hash in [0, 100); 9 hex
#: chars so the stream is independent of both the 7-char dedup hashes
#: and the 8-char sampling coin. Spark + DuckDB twins.
S_BATCH_COIN = f"({s_md5_long('CAST(doc_id AS STRING)', 9)}) % 100"
O_BATCH_COIN = f"({o_md5_long('CAST(doc_id AS VARCHAR)', 9)}) % 100"
BATCH_PCT = 10

ARTIFACTS = ("bands", "sigs")

_BUILT: set[tuple[str, str]] = set()


def index_root(sf_dir: str) -> str:
    return os.path.join(
        _REPO_ROOT, ".scratch", f"minhash_index_{MINHASH_INDEX_VERSION}",
        os.path.basename(sf_dir.rstrip("/")),
    )


def _marker(root: str) -> str:
    return os.path.join(root, "_INDEX_COMPLETE")


def corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing-corpus split of the documents table (coin >= 10%)."""
    return read_table(spark, sf_dir, "documents").filter(
        F.expr(S_BATCH_COIN) >= BATCH_PCT
    )


def batch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arriving-batch split (coin < 10%)."""
    return read_table(spark, sf_dir, "documents").filter(
        F.expr(S_BATCH_COIN) < BATCH_PCT
    )


def build_minhash_index(spark: SparkSession, sf_dir: str) -> str:
    """Derive and persist the corpus band + signature tables. Idempotent
    per (session, sf_dir); a completed on-disk index short-circuits."""
    root = index_root(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BUILT:
        return root
    if os.path.exists(_marker(root)):
        _BUILT.add(key)
        return root

    sh = shingle_set(corpus_docs(spark, sf_dir), "doc_id", "text", SHINGLE_K)
    sigs = minhash_signatures_from_shingles(sh, N_HASHES)
    # one derivation feeds both artifacts: persist the m0..m31 frame
    # first, then band it from the written copy (avoids recomputing the
    # 32-permutation aggregation for the band table)
    sig_path = os.path.join(root, "sigs")
    sigs.select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(N_HASHES)]).alias("sig")
    ).write.mode("overwrite").parquet(sig_path)
    stored = spark.read.parquet(sig_path).select(
        "doc", *[F.col("sig")[i].alias(f"m{i}") for i in range(N_HASHES)]
    )
    band_rows(stored, BANDS).write.mode("overwrite").parquet(
        os.path.join(root, "bands")
    )
    with open(_marker(root), "w") as fh:
        fh.write("ok\n")
    _BUILT.add(key)
    return root


def read_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in ARTIFACTS:
        raise ValueError(f"unknown MinHash index artifact {name!r}")
    root = build_minhash_index(spark, sf_dir)
    return spark.read.parquet(os.path.join(root, name))
