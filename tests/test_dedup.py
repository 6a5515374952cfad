"""Operator-level dedup tests on planted data (independent of the
testdata distribution): exact dups, near-dups at controlled Jaccard,
and clearly-distinct docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one shingle-neighborhood edit
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                      # exact dup of 1
        (3, "  THE quick brown fox! jumps over the lazy dog while the cat watches from the warm windowsill and the birds sing in the garden outside"),  # normalizes to BASE
        (4, NEAR),                      # near dup of 1
        (5, FAR),
        (6, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    groups = D.exact_dedup_groups(docs, "doc_id", "text").collect()
    by_keep = {r.keep_doc_id: r.n_docs for r in groups}
    assert by_keep[1] == 3          # 1, 2, 3 collapse after normalization
    assert by_keep[4] == 1 and by_keep[5] == 1 and by_keep[6] == 1


def test_jaccard_pairs_finds_planted_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in
             D.jaccard_pairs(docs, "doc_id", "text", k=2, threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] > 0.8
    assert all(5 not in p and 6 not in p for p in pairs)


def test_minhash_lsh_equals_exact(docs):
    exact = sorted(
        (r.doc_a, r.doc_b) for r in D.jaccard_pairs(docs, "doc_id", "text", 2, 0.5).collect()
    )
    lsh = sorted(
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_near_dups(docs, "doc_id", "text", 2, 32, 16, 0.5).collect()
    )
    assert lsh == exact


def test_simhash_near_for_near_dups(docs):
    sim = D.simhash(docs, "doc_id", "text", bits=64)
    vals = {r.doc: (r.simhash_hi << 32) | r.simhash_lo for r in sim.collect()}
    assert vals[1] == vals[2] == vals[3]          # identical content → identical hash
    ham14 = bin(vals[1] ^ vals[4]).count("1")
    ham15 = bin(vals[1] ^ vals[5]).count("1")
    assert ham14 < ham15                          # near dup closer than far doc
    near = D.simhash_near_pairs(sim, max_hamming=6, bits=64)
    got = {(r.doc_a, r.doc_b) for r in near.collect()}
    assert (1, 2) in got and (1, 3) in got


def test_simhash_blocking_is_lossless_vs_bruteforce(docs):
    """Pigeonhole blocking must return EXACTLY the brute-force pair set."""
    sim = D.simhash(docs, "doc_id", "text", bits=64)
    rows = sim.collect()
    vals = {r.doc: (r.simhash_hi << 32) | r.simhash_lo for r in rows}
    ids = sorted(vals)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(vals[a] ^ vals[b]).count("1") <= 6
    }
    blocked = {
        (r.doc_a, r.doc_b) for r in D.simhash_near_pairs(sim, max_hamming=6, bits=64).collect()
    }
    assert blocked == brute


def test_simhash64_blocks_finer_than_32(spark):
    """The round-1 upgrade rationale, asserted: 64-bit word-aligned
    blocks are >= 8 bits wide and their worst bucket is no fuller than
    the 32-bit layout's worst 4-5-bit bucket on the same corpus."""
    from pyspark.sql import functions as F

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
        read_table,
    )

    from .conftest import SF_ORACLE

    docs = read_table(spark, SF_ORACLE, "documents")

    def max_occupancy(bits):
        sim = D.simhash(docs, "doc_id", "text", bits=bits)
        blocks = D.simhash_block_table(sim, max_hamming=6, bits=bits)
        return (
            blocks.groupBy("blk", "val").agg(F.count("*").alias("n"))
            .agg(F.max("n").alias("m")).collect()[0]["m"]
        )

    occ64, occ32 = max_occupancy(64), max_occupancy(32)
    assert occ64 <= occ32
    # 64-bit layout: 4 lo-blocks of 8 bits + 3 hi-blocks of 10-11 bits
    sim = D.simhash(docs.limit(1), "doc_id", "text", bits=64)
    n_blocks = D.simhash_block_table(sim, 6, 64).count()
    assert n_blocks == 7


def test_latest_wins_keeps_newest(spark):
    rows = [
        ("c1", "2020-01-01", 1),
        ("c1", "2021-06-01", 2),
        ("c1", None, 3),           # null order date loses (NULLS LAST)
        ("c2", "2019-01-01", 4),
    ]
    df = spark.createDataFrame(rows, ["k", "d", "id"]).withColumn("d", F.to_date("d"))
    kept = {r.k: r.id for r in D.latest_wins(df, "k", "d", "id").collect()}
    assert kept == {"c1": 2, "c2": 4}


def test_connected_components_chain_and_singletons(spark):
    """Chain 1-2-3-4-5 (diameter 4, multiple propagation rounds) plus a
    separate pair and isolated nodes."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], ["doc_a", "doc_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], ["node"])
    got = {r.node: r.component for r in D.connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7, 8: 8, 9: 8, 10: 10}


def test_connected_components_raises_without_convergence(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"])
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], ["node"])
    with pytest.raises(RuntimeError, match="converge"):
        D.connected_components(edges, nodes, max_iters=1)


def test_substring_spans_hand_computed(spark):
    """Two docs sharing one 8-word passage at different offsets, a third
    sharing nothing long enough: exactly one span, exact offsets, and
    maximality (the span is reported once, not once per k-gram)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, "x y z " + shared + " tail1 tail2"),
            (2, "p q " + shared + " other words here"),
            (3, "alpha beta gamma completely different suffix now"),
        ],
        "doc_id long, text string",
    )
    got = D.substring_spans(docs, k=3, min_words=8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["d1"], r["d2"]) == (1, 2)
    assert (r["start1"], r["start2"], r["span_words"]) == (3, 2, 8)


def test_substring_spans_within_doc_repeats_stay_on_diagonals(spark):
    """A phrase repeated twice in doc 2 against one occurrence in doc 1
    yields two spans (two diagonals), never a merged/corrupted run."""
    phrase = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, phrase + " filler"),
            (2, phrase + " mid " + phrase),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["start1"], r["start2"], r["span_words"])
        for r in D.substring_spans(docs, k=2, min_words=5).collect()
    )
    assert got == [(0, 0, 5), (0, 6, 5)]


def test_substring_spans_max_df_drops_boilerplate(spark):
    """A gram present in every doc (boilerplate) is dropped by max_df;
    spans made ONLY of capped grams disappear, others survive."""
    boiler = "copyright footer text here always"
    docs = spark.createDataFrame(
        [(i, f"doc {i} unique words " + boiler) for i in range(1, 6)],
        "doc_id long, text string",
    )
    uncapped = D.substring_spans(docs, k=2, min_words=5).count()
    capped = D.substring_spans(docs, k=2, min_words=5, max_df=3).count()
    assert uncapped == 10  # all C(5,2) pairs share the 5-word boilerplate
    assert capped == 0
