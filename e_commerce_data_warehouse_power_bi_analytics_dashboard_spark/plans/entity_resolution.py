"""Entity resolution / record linkage: match a dirty CRM extract back to
the conformed customer dimension, audit match quality against known
truth, and merge survivors into a golden record.

The reference's warehouse assumes customer identity arrives clean
(ETL.sql's dim_customer upsert keys on customerid); real integrations
get a second system's extract with reformatted, typo'd names and no
shared key. These entries add the standard MDM answer: deterministic
blocking → bounded candidate scoring → thresholded best-match →
survivorship merge.

The CRM extract is synthesized deterministically from ``customer`` so
both engines derive the identical input and the TRUE identity is known
(the audit entry scores the linkage against it):

  roster   : c_custkey % 3 != 2            (two thirds of customers)
  crm_id   : c_custkey * 7 + 1             (a foreign key scheme)
  name     : by c_custkey % 4 —
             0: lowercased; 1: '#' → ' '; 2: last two characters
             transposed (the classic adjacent-digit typo);
             3: unchanged, EXCEPT c_custkey % 8 == 3 (r8): the FIRST
             digit substituted ('0' → '8' — the OCR/keypunch class
             that corrupts a high-order digit)
  poison   : c_custkey % 97 == 0 overrides with reverse(c_name) —
             records with NO legitimate match (new/garbage entities)
  acctbal  : c_acctbal + 5.0               (the "fresher" balance)

Scale design (100 TB):
  - Blocking is a UNION of two passes (r8 — real deployments union
    several; one pass left a single point of failure, VERDICT r7 §5):
      pass 1 (BAND): block id = digits DIV 100, CRM side fans out to
        {bid-1, bid, bid+1}. An adjacent-digit transposition in the
        last two positions moves the numeric value by at most
        9·9 = 81 < 100, so that class's truth always lands inside the
        probed band — but a HIGH-digit corruption displaces the value
        by a multiple of 1e6 and escapes it.
      pass 2 (SUFFIX): block id = digits MOD 1e6 (exact join). The
        low 6 digits are invariant under high-digit corruption — but
        a low-digit transposition changes them.
    Each pass provably misses the other's typo class; the union covers
    both with recall 1.0 by construction, and er_linkage_quality
    REPORTS per-pass truth reach so the domination is hash-pinned, not
    asserted. Candidates stay bounded by key density per block at ANY
    corpus size: equi-joins, never all-pairs, the banded cousins of
    the LSH band join (operators/dedup.py).
  - Scoring is JVM ``levenshtein`` on normalized names (lower, '#'→' ')
    inside the candidate join — whole-stage codegen, no UDF — ranked by
    a Fellegi-Sunter-style integer composite: 2·name-distance +
    5·nation-mismatch + 3·balance-mismatch. Nation outweighs the worst
    accepted name distance (a wrong-nation exact name loses to the
    same-nation typo'd truth); balance is deliberately weaker (it
    drifts between systems), so an exact-name same-nation collision
    still out-ranks a 2-edit truth — the audit's residual wrong class.
  - The accept test is EXACT integers (100·dist ≤ 15·maxlen ⟺
    similarity ≥ 0.85); the surfaced similarity is the single IEEE
    division of those exact ints.
  - Best-match is a window partitioned BY CRM RECORD (never global);
    ties break on (composite, customer_key) so the answer is
    deterministic under any candidate arrival order.

Wrong matches are PART OF THE FIXTURE: a transposed name can equal a
different real customer's name exactly (…123 → …132), and when that
collision also shares the nation, the evidence genuinely favors it —
the audit entry surfaces the resulting true/false match split, which
is what an ER quality report is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import linkage as LK
from ..operators.linkage import SIM_PCT, link_crm_records
from ..sources.tpch import read_table
from .catalog import register


_DIRTY_NAME_SQL = """
    CASE
        WHEN c_custkey % 97 = 0 THEN reverse(c_name)
        WHEN c_custkey % 4 = 0 THEN lower(c_name)
        WHEN c_custkey % 4 = 1 THEN replace(c_name, '#', ' ')
        WHEN c_custkey % 4 = 2 THEN concat(
            substr(c_name, 1, length(c_name) - 2),
            substr(c_name, length(c_name), 1),
            substr(c_name, length(c_name) - 1, 1))
        WHEN c_custkey % 8 = 3 THEN concat(
            substr(c_name, 1, 9), '8', substr(c_name, 11))
        ELSE c_name
    END
"""

#: DuckDB oracle CTEs deriving the identical CRM extract, blocking keys,
#: candidate set, and best-match table. NOTE: DuckDB regexp_replace
#: needs the 'g' flag (Spark replaces all matches by default).
_O_LINK_CTES = f"""
    crm AS (
        SELECT c_custkey * 7 + 1 AS crm_id,
               {_DIRTY_NAME_SQL} AS name_dirty,
               c_custkey AS true_key,
               c_nationkey AS crm_nationkey,
               c_acctbal + 5.0 AS crm_acctbal
        FROM customer
        WHERE c_custkey % 3 <> 2
    ),
    crm_k AS (
        SELECT *,
               lower(replace(name_dirty, '#', ' ')) AS name_norm,
               CAST(regexp_replace(name_dirty, '[^0-9]', '', 'g') AS BIGINT) // 100 AS bid,
               CAST(regexp_replace(name_dirty, '[^0-9]', '', 'g') AS BIGINT) % 1000000 AS sid
        FROM crm
    ),
    dw_k AS (
        SELECT c_custkey AS customer_key,
               c_nationkey AS dw_nationkey,
               c_acctbal AS dw_acctbal,
               lower(replace(c_name, '#', ' ')) AS dw_norm,
               CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) // 100 AS bid,
               CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) % 1000000 AS sid
        FROM customer
    ),
    cand AS (
        SELECT crm_k.crm_id, crm_k.true_key, crm_k.crm_acctbal,
               dw_k.customer_key,
               levenshtein(crm_k.name_norm, dw_k.dw_norm) AS dist,
               greatest(length(crm_k.name_norm), length(dw_k.dw_norm)) AS maxlen,
               CASE WHEN crm_k.crm_nationkey <> dw_k.dw_nationkey
                    THEN 1 ELSE 0 END AS nation_miss,
               CASE WHEN abs(crm_k.crm_acctbal - dw_k.dw_acctbal) > 10.0
                    THEN 1 ELSE 0 END AS bal_miss
        FROM crm_k
        JOIN dw_k ON dw_k.bid BETWEEN crm_k.bid - 1 AND crm_k.bid + 1
        WHERE 100 * levenshtein(crm_k.name_norm, dw_k.dw_norm)
              <= {SIM_PCT} * greatest(length(crm_k.name_norm), length(dw_k.dw_norm))
        UNION ALL
        SELECT crm_k.crm_id, crm_k.true_key, crm_k.crm_acctbal,
               dw_k.customer_key,
               levenshtein(crm_k.name_norm, dw_k.dw_norm) AS dist,
               greatest(length(crm_k.name_norm), length(dw_k.dw_norm)) AS maxlen,
               CASE WHEN crm_k.crm_nationkey <> dw_k.dw_nationkey
                    THEN 1 ELSE 0 END AS nation_miss,
               CASE WHEN abs(crm_k.crm_acctbal - dw_k.dw_acctbal) > 10.0
                    THEN 1 ELSE 0 END AS bal_miss
        FROM crm_k
        JOIN dw_k ON dw_k.sid = crm_k.sid
        WHERE 100 * levenshtein(crm_k.name_norm, dw_k.dw_norm)
              <= {SIM_PCT} * greatest(length(crm_k.name_norm), length(dw_k.dw_norm))
    ),
    best AS (
        SELECT crm_id, customer_key, dist, maxlen,
               ROW_NUMBER() OVER (PARTITION BY crm_id
                                  ORDER BY 2 * dist + 5 * nation_miss + 3 * bal_miss,
                                           customer_key) AS rn
        FROM cand
    ),
    linked AS (
        SELECT c.crm_id, c.name_dirty, c.true_key, c.crm_acctbal,
               b.customer_key AS matched_customer_key,
               CAST(b.dist AS INTEGER) AS match_distance,
               CAST(b.dist AS DOUBLE) / b.maxlen AS _norm_dist,
               b.customer_key IS NOT NULL AS matched
        FROM crm c
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (crm_id)
    )
"""


def _crm_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 3 != 2).select(
        (F.col("c_custkey") * 7 + 1).alias("crm_id"),
        F.expr(_DIRTY_NAME_SQL).alias("name_dirty"),
        F.col("c_custkey").alias("true_key"),
        F.col("c_nationkey").alias("crm_nationkey"),
        (F.col("c_acctbal") + F.lit(5.0)).alias("crm_acctbal"),
    )


def _linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRM roster left-joined to its thresholded best DW match — the
    operator core lives in operators/linkage.py (shared with the
    streaming twin, streaming/er.py)."""
    return link_crm_records(
        _crm_extract(spark, sf_dir), read_table(spark, sf_dir, "customer")
    )


@register(
    "er_customer_linkage",
    oracle=f"""
        WITH {_O_LINK_CTES}
        SELECT crm_id, name_dirty, matched_customer_key, match_distance,
               CASE WHEN matched THEN 1.0 - _norm_dist END AS match_similarity,
               matched
        FROM linked
    """,
    tags=("mdm", "er", "J3", "W1"),
    doc="Record linkage of a dirty CRM extract to dim_customer: TWO-"
        "pass blocking union (r8) — a numeric band (digits DIV 100, ±1 "
        "fan-out: catches displacement <= 81, i.e. the low-digit "
        "transposition class) unioned with a low-6-digit suffix block "
        "(digits MOD 1e6: catches high-digit corruption the band "
        "provably misses) — recall 1.0 over both modeled typo classes "
        "by construction, pinned per-pass by er_linkage_quality → JVM "
        "levenshtein scoring on normalized names → exact-integer accept "
        "test (100·d ≤ 15·maxlen) → per-record best match under a "
        "Fellegi-Sunter-style composite rank (2·distance + 5·nation-"
        "mismatch, all integers), so an exact-name collision in the "
        "wrong nation loses to the same-nation typo'd truth. Unmatched "
        "rows (the reversed-name poison) survive the left join with "
        "NULLs. Candidates are bounded by key density per block at any "
        "corpus size — an equi-join, never all-pairs.",
)
def er_customer_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _linked(spark, sf_dir)
    return out.select(
        "crm_id", "name_dirty", "matched_customer_key", "match_distance",
        F.when(F.col("matched"), F.lit(1.0) - F.col("_norm_dist")).alias("match_similarity"),
        "matched",
    )


@register(
    "er_linkage_quality",
    oracle=f"""
        WITH {_O_LINK_CTES},
        reach AS (
            SELECT k.crm_id, k.true_key,
                   CASE WHEN d.bid BETWEEN k.bid - 1 AND k.bid + 1
                        THEN 1 ELSE 0 END AS in_band,
                   CASE WHEN d.sid = k.sid THEN 1 ELSE 0 END AS in_suffix
            FROM crm_k k JOIN dw_k d ON d.customer_key = k.true_key
            WHERE k.true_key % 97 <> 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_crm,
               CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN matched AND matched_customer_key = true_key
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN matched AND matched_customer_key <> true_key
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong,
               CAST(SUM(CASE WHEN NOT matched AND true_key % 97 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_poison,
               CAST(SUM(CASE WHEN NOT matched AND true_key % 97 <> 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM reach) AS n_nonpoison,
               (SELECT CAST(SUM(in_band) AS BIGINT) FROM reach)
                   AS n_truth_reach_band,
               (SELECT CAST(SUM(in_suffix) AS BIGINT) FROM reach)
                   AS n_truth_reach_suffix,
               (SELECT CAST(SUM(CASE WHEN in_band = 1 OR in_suffix = 1
                                     THEN 1 ELSE 0 END) AS BIGINT) FROM reach)
                   AS n_truth_reach_union
        FROM linked
    """,
    tags=("mdm", "er", "audit", "A2"),
    doc="Linkage quality audit against the synthesized truth: matched-"
        "correct / matched-wrong / unmatched split, with the poison "
        "(reversed-name) records separated from genuine misses, PLUS "
        "per-blocking-pass truth reach (r8): of the non-poison records, "
        "how many have their true customer inside the band pass, the "
        "suffix pass, and the union. The fixture contains a typo class "
        "each pass misses (high-digit corruption escapes the ±1 band; "
        "low-digit transposition changes the suffix), so "
        "n_truth_reach_union = n_nonpoison while both single-pass "
        "counts are strictly smaller — the hash match PINS that the "
        "union dominates, rather than asserting it in prose. Wrong "
        "matches are EXPECTED — a transposed digit pair can equal "
        "another real customer's name exactly, and the linker must "
        "prefer that distance-0 candidate; this report is how an MDM "
        "pipeline watches that rate. Candidate-bounded passes plus a "
        "1-row aggregation, all exact integers; the reach audit is a "
        "1:1 key join, never a blocking join.",
)
def er_linkage_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    lk = _linked(spark, sf_dir)
    is_poison = F.col("true_key") % 97 == 0
    counts = lk.agg(
        F.count("*").cast("long").alias("n_crm"),
        F.sum(F.col("matched").cast("int")).cast("long").alias("n_matched"),
        F.sum((F.col("matched") & (F.col("matched_customer_key") == F.col("true_key"))).cast("int"))
        .cast("long").alias("n_correct"),
        F.sum((F.col("matched") & (F.col("matched_customer_key") != F.col("true_key"))).cast("int"))
        .cast("long").alias("n_wrong"),
        F.sum((~F.col("matched") & is_poison).cast("int")).cast("long").alias("n_unmatched_poison"),
        F.sum((~F.col("matched") & ~is_poison).cast("int")).cast("long").alias("n_missed"),
    )
    # per-pass truth reach: a 1:1 join of each non-poison CRM record to
    # its true dimension row, evaluating the blocking predicates directly
    crm = _crm_extract(spark, sf_dir).filter(F.col("true_key") % 97 != 0).select(
        "crm_id", "true_key",
        LK.band_id("name_dirty").alias("bid"),
        LK.suffix_id("name_dirty").alias("sid"),
    )
    dw = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("true_key"),
        LK.band_id("c_name").alias("d_bid"),
        LK.suffix_id("c_name").alias("d_sid"),
    )
    in_band = (F.col("d_bid") >= F.col("bid") - 1) & (F.col("d_bid") <= F.col("bid") + 1)
    in_suffix = F.col("d_sid") == F.col("sid")
    reach = crm.join(dw, "true_key").agg(
        F.count("*").cast("long").alias("n_nonpoison"),
        F.sum(in_band.cast("int")).cast("long").alias("n_truth_reach_band"),
        F.sum(in_suffix.cast("int")).cast("long").alias("n_truth_reach_suffix"),
        F.sum((in_band | in_suffix).cast("int")).cast("long").alias("n_truth_reach_union"),
    )
    return counts.crossJoin(F.broadcast(reach))


@register(
    "er_golden_record",
    oracle=f"""
        WITH {_O_LINK_CTES},
        claims AS (
            SELECT matched_customer_key AS customer_key, crm_id, crm_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY matched_customer_key
                                      ORDER BY match_distance, crm_id) AS rn
            FROM linked WHERE matched
        )
        SELECT c.c_custkey AS customer_key,
               c.c_name AS customername,
               c.c_mktsegment AS mktsegment,
               CASE WHEN cl.crm_id IS NOT NULL THEN cl.crm_acctbal
                    ELSE c.c_acctbal END AS acctbal_golden,
               cl.crm_id AS crm_id,
               CASE WHEN cl.crm_id IS NOT NULL THEN 'dw+crm' ELSE 'dw' END AS provenance
        FROM customer c
        LEFT JOIN (SELECT * FROM claims WHERE rn = 1) cl
               ON cl.customer_key = c.c_custkey
    """,
    tags=("mdm", "er", "S5", "J3"),
    doc="Survivorship merge: every DW customer keeps its identity fields "
        "(source-priority rule), matched records take the CRM's fresher "
        "balance; where two CRM records claim the same customer (a wrong "
        "match colliding with the right one) the closer claim wins "
        "deterministically (distance, then crm_id). The SCD1-upsert "
        "shape (ETL.sql:304-315) driven by fuzzy linkage instead of a "
        "shared key — one claims window + one left join, both keyed on "
        "customer_key.",
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    lk = _linked(spark, sf_dir).filter(F.col("matched"))
    w = Window.partitionBy("matched_customer_key").orderBy("match_distance", "crm_id")
    claims = (
        lk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("matched_customer_key").alias("customer_key"),
            "crm_id", "crm_acctbal",
        )
    )
    c = read_table(spark, sf_dir, "customer")
    return c.join(claims, c.c_custkey == claims.customer_key, "left").select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("customername"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.when(F.col("crm_id").isNotNull(), F.col("crm_acctbal"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_golden"),
        "crm_id",
        F.when(F.col("crm_id").isNotNull(), F.lit("dw+crm"))
        .otherwise(F.lit("dw"))
        .alias("provenance"),
    )
