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

  bands/   (doc, band_idx, bh)  — the LSH probe table, persisted as a
                                  BUCKETED parquet table (bucketBy +
                                  sortBy on (band_idx, bh), one file
                                  per bucket): a shuffle-join probe
                                  reads the corpus side in place with
                                  NO Exchange — only the arriving
                                  batch shuffles, which is exactly the
                                  cost split a 100 TB standing corpus
                                  needs (tests pin the executed plan)
  sigs/    (doc, sig long[])    — for the signature-agreement
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

MINHASH_INDEX_VERSION = "v2"  # v2: bands persisted bucketed on (band_idx, bh)

#: index hyper-parameters (match dedup_minhash_lsh's banding)
N_HASHES, BANDS, SHINGLE_K = 32, 16, 2

#: bucket count of the persisted band table. The bucket id is
#: pmod(murmur3(band_idx, bh), N) — the SAME hash Spark's shuffle
#: partitioning uses, so repartition(N_BUCKETS, keys) before the
#: bucketed write lands each task on exactly one bucket (one file per
#: bucket, which is also what lets the sorted-scan ordering survive).
N_BUCKETS = 8

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


def bands_table_name(sf_dir: str) -> str:
    """Catalog name of the bucketed band table for ``sf_dir``. Bucketing
    metadata lives in the session catalog (parquet files alone don't
    carry it), so the table is (re)registered by name with an explicit
    LOCATION — any session can attach to an index built by another."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    return f"minhash_bands_{MINHASH_INDEX_VERSION}_{tag}"


def _bands_ddl_path(root: str) -> str:
    return os.path.join(root, "_bands_columns.ddl")


def _attach(spark: SparkSession, tbl: str, root: str) -> DataFrame:
    """Register (if this session hasn't yet) and return a bucketed
    band table. CREATE TABLE ... CLUSTERED BY ... LOCATION re-attaches
    the on-disk bucket files with their bucketing spec, so a fresh
    session still gets the exchange-free scan. ONE definition serves
    the v2 corpus index and the incremental index — the DDL and bucket
    spec can never drift apart."""
    if not spark.catalog.tableExists(tbl):
        with open(_bands_ddl_path(root)) as fh:
            cols = fh.read().strip()
        loc = os.path.join(root, "bands")
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING parquet "
            f"CLUSTERED BY (band_idx, bh) SORTED BY (band_idx, bh) "
            f"INTO {N_BUCKETS} BUCKETS LOCATION '{loc}'"
        )
    return spark.table(tbl)


def _attach_bands_table(spark: SparkSession, sf_dir: str, root: str) -> DataFrame:
    return _attach(spark, bands_table_name(sf_dir), root)


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
    bands = band_rows(stored, BANDS)
    with open(_bands_ddl_path(root), "w") as fh:
        fh.write(", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in bands.schema.fields
        ))
    tbl = bands_table_name(sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        # pre-shuffle on the bucket keys with the bucket count: Spark's
        # bucket id and its shuffle hash are the same murmur3, so each
        # write task holds exactly one bucket → one sorted file per
        # bucket (the layout the sorted bucketed scan needs)
        bands.repartition(N_BUCKETS, "band_idx", "bh")
        .write.bucketBy(N_BUCKETS, "band_idx", "bh")
        .sortBy("band_idx", "bh")
        .option("path", os.path.join(root, "bands"))
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    with open(_marker(root), "w") as fh:
        fh.write("ok\n")
    _BUILT.add(key)
    return root


def read_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in ARTIFACTS:
        raise ValueError(f"unknown MinHash index artifact {name!r}")
    root = build_minhash_index(spark, sf_dir)
    if name == "bands":
        return _attach_bands_table(spark, sf_dir, root)
    return spark.read.parquet(os.path.join(root, name))


# ---------------------------------------------------------------------------
# Incremental fold (r11 — verdict #1): append an ACCEPTED batch's band
# rows into the standing index, bucket-aligned, instead of rebuilding.
#
# Band signatures are PER-DOCUMENT deterministic (shingle → md5 → 32
# affine permutations → band hash — no corpus statistics anywhere), so
# folding a batch into the index is pure encode + append: derive the
# batch's rows, write them into the SAME bucketed table. Spark's bucket
# id is pmod(murmur3(keys), N) — the identical function for every
# writer — so appended files are bucket-ALIGNED with the base build:
# the exchange-free corpus-side probe survives the fold (each bucket
# now holds base + K delta files; the scan loses only the per-bucket
# single-file SORT guarantee, which is the documented periodic
# re-bucket compaction trade — probes re-sort in-bucket, they never
# re-shuffle). folded == rebuilt-from-scratch on the union corpus holds
# EXACTLY (the minhash_index_fold_manifest oracle re-derives the union
# from raw documents), which is the property an exact-encode fold has
# and a centroid-frozen ANN fold (quality drift, see
# ann_index_append_recall_audit) does not.
#
# Own versioned root — never an extension of the v2 build sequence, so
# a pre-fold v2 index from an older session can't half-match.
# ---------------------------------------------------------------------------

MINHASH_INCR_VERSION = "v1"


def incr_index_root(sf_dir: str) -> str:
    return os.path.join(
        _REPO_ROOT, ".scratch", f"minhash_index_incr_{MINHASH_INCR_VERSION}",
        os.path.basename(sf_dir.rstrip("/")),
    )


def incr_bands_table_name(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    return f"minhash_bands_incr_{MINHASH_INCR_VERSION}_{tag}"


def _sig_array_frame(docs: DataFrame) -> DataFrame:
    """(doc, sig long[32]) for ``docs`` — the one deterministic encode
    path shared by base build and fold."""
    sh = shingle_set(docs, "doc_id", "text", SHINGLE_K)
    sigs = minhash_signatures_from_shingles(sh, N_HASHES)
    return sigs.select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(N_HASHES)]).alias("sig")
    )


def _bands_from_stored(spark: SparkSession, sig_path: str,
                       where: str | None = None) -> DataFrame:
    """Band rows derived from the PERSISTED signature store (optionally
    a coin-filtered slice) — the 32-permutation aggregation runs once
    per document at sig-write time, never again for the band table
    (the same read-back pattern build_minhash_index uses)."""
    stored = spark.read.parquet(sig_path)
    if where:
        stored = stored.filter(where)
    wide = stored.select(
        "doc", *[F.col("sig")[i].alias(f"m{i}") for i in range(N_HASHES)]
    )
    return band_rows(wide, BANDS)


def _bucketed_band_write(bands: DataFrame, tbl: str, path: str, mode: str) -> None:
    """Bucket-aligned write of band rows (pre-shuffled on the bucket
    keys so each task holds exactly one bucket — one new file per
    bucket per write)."""
    (
        bands.repartition(N_BUCKETS, "band_idx", "bh")
        .write.bucketBy(N_BUCKETS, "band_idx", "bh")
        .sortBy("band_idx", "bh")
        .option("path", path)
        .mode(mode)
        .saveAsTable(tbl)
    )


def build_incr_base(spark: SparkSession, sf_dir: str) -> str:
    """Base generation: the CORPUS split's bands (bucketed table) +
    signatures, under the incremental root."""
    root = incr_index_root(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir + "#incr_base")
    if key in _BUILT:
        return root
    if os.path.exists(os.path.join(root, "_BASE_COMPLETE")):
        _BUILT.add(key)
        return root
    sig_path = os.path.join(root, "sigs")
    _sig_array_frame(corpus_docs(spark, sf_dir)).write.mode(
        "overwrite"
    ).parquet(sig_path)
    bands = _bands_from_stored(spark, sig_path)
    with open(os.path.join(root, "_bands_columns.ddl"), "w") as fh:
        fh.write(", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in bands.schema.fields
        ))
    tbl = incr_bands_table_name(sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    _bucketed_band_write(
        bands, tbl, os.path.join(root, "bands"), "overwrite"
    )
    with open(os.path.join(root, "_BASE_COMPLETE"), "w") as fh:
        fh.write("ok\n")
    _BUILT.add(key)
    return root


def _attach_incr_bands(spark: SparkSession, sf_dir: str, root: str) -> DataFrame:
    return _attach(spark, incr_bands_table_name(sf_dir), root)


def fold_incr_batch(spark: SparkSession, sf_dir: str) -> str:
    """FOLD the arriving batch: derive ITS band rows + signatures and
    append them bucket-aligned into the standing table (one new file
    per bucket; base files untouched — pinned by
    tests/test_minhash_index.py). Crash-safe via the marker: an
    interrupted fold reruns from the base generation because the
    completion marker is written last and the batch append is the only
    non-idempotent step — a torn append without a marker triggers a
    base rebuild (DROP + overwrite) on the next call."""
    root = build_incr_base(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir + "#incr_fold")
    if key in _BUILT:
        return root
    if os.path.exists(os.path.join(root, "_FOLD_COMPLETE")):
        _BUILT.add(key)
        return root
    # torn-fold recovery: a previous fold started (no marker) in some
    # crashed process — rebuild the base generation from scratch so the
    # append below lands exactly once
    if os.path.exists(os.path.join(root, "_FOLD_STARTED")):
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS {incr_bands_table_name(sf_dir)}")
        shutil.rmtree(root)
        _BUILT.discard((spark.sparkContext.applicationId, sf_dir + "#incr_base"))
        build_incr_base(spark, sf_dir)
    with open(os.path.join(root, "_FOLD_STARTED"), "w") as fh:
        fh.write("ok\n")
    sig_path = os.path.join(root, "sigs")
    _sig_array_frame(batch_docs(spark, sf_dir)).write.mode(
        "append"
    ).parquet(sig_path)
    # band the BATCH slice of the stored sigs (coin-filtered — the sig
    # store now holds corpus + batch); the derivation never re-runs
    bands_b = _bands_from_stored(
        spark, sig_path,
        where=S_BATCH_COIN.replace("doc_id", "doc") + f" < {BATCH_PCT}",
    )
    _attach_incr_bands(spark, sf_dir, root)
    _bucketed_band_write(
        bands_b, incr_bands_table_name(sf_dir),
        os.path.join(root, "bands"), "append",
    )
    with open(os.path.join(root, "_FOLD_COMPLETE"), "w") as fh:
        fh.write("ok\n")
    _BUILT.add(key)
    return root


def compact_incr_index(spark: SparkSession, sf_dir: str) -> int:
    """RE-BUCKET COMPACTION — the periodic maintenance pass the fold's
    documented trade calls for: after K folds each bucket holds K+1
    files (probe joins re-sort in-bucket), so compaction rewrites the
    folded band table back to ONE sorted file per bucket — same rows,
    same bucket function, restored sorted-scan property. The rewrite
    stages into a fresh directory and swaps via the DDL re-attachment
    (never an in-place overwrite of the table being read), mirroring
    how OPTIMIZE rewrites land in the table format. Returns the number
    of band files retired."""
    import glob
    import shutil

    import re as _re

    root = fold_incr_batch(spark, sf_dir)
    bands_dir = os.path.join(root, "bands")
    before = glob.glob(os.path.join(bands_dir, "*.parquet"))
    # compact when any BUCKET holds >1 file (the bucket id is the
    # _NNNNN filename suffix; a total-count heuristic would miss
    # multi-file buckets whenever other buckets are empty)
    per_bucket: dict[str, int] = {}
    for f in before:
        m = _re.search(r"_(\d{5})\.", os.path.basename(f))
        b = m.group(1) if m else os.path.basename(f)
        per_bucket[b] = per_bucket.get(b, 0) + 1
    if not per_bucket or max(per_bucket.values()) <= 1:
        return 0  # one file per non-empty bucket: nothing to compact
    tbl = incr_bands_table_name(sf_dir)
    # read as PLAIN parquet, not the bucketed table: a bucketed scan
    # already satisfies the hash requirement, so the planner elides the
    # repartition and each input SPLIT writes its own file — 2 files
    # per bucket again instead of the one-per-bucket this pass exists
    # to restore
    rows = spark.read.parquet(bands_dir)
    staged = bands_dir + ".compact"
    tmp_tbl = tbl + "_compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    if os.path.exists(staged):
        shutil.rmtree(staged)
    _bucketed_band_write(rows, tmp_tbl, staged, "overwrite")
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    old = bands_dir + ".old"
    os.rename(bands_dir, old)
    os.rename(staged, bands_dir)
    shutil.rmtree(old)
    _attach_incr_bands(spark, sf_dir, root)
    after = glob.glob(os.path.join(bands_dir, "*.parquet"))
    return len(before) - len(after)


def read_folded_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A FOLDED artifact (corpus base + appended batch) — folds first if
    this (session, sf_dir) hasn't."""
    if name not in ARTIFACTS:
        raise ValueError(f"unknown MinHash index artifact {name!r}")
    root = fold_incr_batch(spark, sf_dir)
    if name == "bands":
        return _attach_incr_bands(spark, sf_dir, root)
    return spark.read.parquet(os.path.join(root, "sigs"))
