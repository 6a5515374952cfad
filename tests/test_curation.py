"""Edge-semantics tests for the curation and analytics layers (beyond
the oracle gate, which already pins cross-engine value equality).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)

from .conftest import SF_ORACLE

CATALOG = get_catalog()


def test_chunk_overlap_and_boundaries(spark):
    df = CATALOG["curation_doc_chunks"].fn(spark, SF_ORACLE).cache()
    # every chunk is at most CHUNK_TOKENS long; only a doc's last chunk
    # may be shorter than the overlap region forces
    assert df.filter(F.col("n_chunk_tokens") > CHUNK_TOKENS).count() == 0
    # chunk_idx is dense from 0 per doc
    per_doc = df.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("chunk_idx").alias("mx"), F.min("chunk_idx").alias("mn")
    )
    assert per_doc.filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count() == 0
    # consecutive chunks of one doc overlap by CHUNK_TOKENS - CHUNK_STRIDE
    # tokens: chunk i's tail == chunk i+1's head (spot-check a multi-chunk doc)
    multi = [r.doc_id for r in per_doc.filter("n >= 2").limit(1).collect()]
    assert multi, "expected at least one multi-chunk document"
    rows = (
        df.filter(F.col("doc_id") == multi[0]).orderBy("chunk_idx").collect()
    )
    t0 = rows[0].chunk_text.split(" ")
    t1 = rows[1].chunk_text.split(" ")
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    assert t0[CHUNK_STRIDE : CHUNK_STRIDE + overlap] == t1[:overlap]
    df.unpersist()


def test_pii_redaction_counts_and_clean_docs(spark):
    df = CATALOG["curation_pii_redact"].fn(spark, SF_ORACLE).cache()
    # injection is doc_id-keyed: %5 docs get exactly one email, %7 one phone
    bad = df.filter(
        (F.col("n_emails") != F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0))
        | (F.col("n_phones") != F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0))
    ).count()
    assert bad == 0
    df.unpersist()


def test_decontam_flags_planted_pair_only(spark):
    df = CATALOG["curation_decontam_overlap"].fn(spark, SF_ORACLE).cache()
    flagged = df.filter("is_contaminated").collect()
    # the synthetic corpus plants near-dup pairs; exactly the planted
    # partner of a benchmark doc crosses tau, background stays far below
    assert len(flagged) >= 1
    assert all(r.containment >= 0.5 for r in flagged)
    background = df.filter(~F.col("is_contaminated")).agg(F.max("containment")).first()[0]
    assert background < 0.3
    df.unpersist()


def test_repetition_ratio_bounds(spark):
    df = CATALOG["curation_repetition_score"].fn(spark, SF_ORACLE)
    bad = df.filter(
        (F.col("dup_ratio") < 0) | (F.col("dup_ratio") >= 1) | (F.col("n_unique") > F.col("n_grams"))
    ).count()
    assert bad == 0


def test_rfm_scores_tie_aware_quartiles(spark):
    """The r3 rewrite scores against broadcast percentile_disc cutpoints
    (map-side, no global window).  That trades ntile's within-1 bucket
    balance for tie consistency; assert the properties the cutpoint
    semantics actually promise:

    - every customer gets all three scores, each in 1..4;
    - equal metric values always get equal scores (ntile can split ties);
    - percentile_disc(q) bounds: at least q of the population scores
      <= s for the cut at s (score s means value <= the s'th cutpoint).
    """
    df = CATALOG["rfm_customer_segments"].fn(spark, SF_ORACLE).cache()
    n = df.count()
    assert n > 0
    for metric, col, sign in (
        ("recency_days", "r_score", 1),
        ("frequency", "f_score", -1),
        ("monetary", "m_score", -1),
    ):
        counts = {r[col]: r["cnt"] for r in df.groupBy(col).agg(F.count("*").alias("cnt")).collect()}
        assert set(counts) <= {1, 2, 3, 4} and 1 in counts, (col, counts)
        assert sum(counts.values()) == n
        # percentile_disc lower bound: >= 25*s % of customers score <= s
        running = 0
        for s in (1, 2, 3):
            running += counts.get(s, 0)
            assert running >= 0.25 * s * n - 1e-9, (col, s, counts)
        # ties score equally: one distinct score per distinct metric value
        tied = (
            df.groupBy(metric)
            .agg(F.countDistinct(col).alias("k"))
            .agg(F.max("k").alias("mx"))
            .first()
            .mx
        )
        assert tied == 1, (metric, col)
        # scores are monotone in the (signed) metric: the max metric value
        # inside score s never exceeds the min inside score s+1
        bounds = {
            r[col]: (r.lo, r.hi)
            for r in df.groupBy(col)
            .agg(F.min(F.col(metric) * sign).alias("lo"), F.max(F.col(metric) * sign).alias("hi"))
            .collect()
        }
        ordered = sorted(bounds)
        for a, b in zip(ordered, ordered[1:]):
            assert bounds[a][1] < bounds[b][0], (col, bounds)
    df.unpersist()


def test_pareto_share_monotone_and_classes_ordered(spark):
    rows = (
        CATALOG["pareto_product_abc"].fn(spark, SF_ORACLE)
        .orderBy(F.desc("revenue"), F.asc("product_key"))
        .collect()
    )
    shares = [r.cum_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9
    # class boundaries appear in A..B..C order along the ranking
    classes = "".join(r.abc_class for r in rows)
    assert classes == "A" * classes.count("A") + "B" * classes.count("B") + "C" * classes.count("C")


def test_basket_pairs_canonical_order(spark):
    rows = CATALOG["basket_product_pairs"].fn(spark, SF_ORACLE).collect()
    assert rows and all(r.product_a < r.product_b for r in rows)
    counts = [r.n_baskets for r in rows]
    assert counts == sorted(counts, reverse=True)
