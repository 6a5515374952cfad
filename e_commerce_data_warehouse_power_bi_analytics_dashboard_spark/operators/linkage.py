"""Record-linkage operator core: banded blocking + composite-rank best
match of keyless records against a reference dimension.

Extracted from plans/entity_resolution.py (which documents the full
design, the synthesized truth fixture, and the DuckDB oracle twin) so
the streaming surface (streaming/er.py) can run the identical operator
per micro-batch. See that module's docstring for the 100 TB design
notes; the short version:

  - blocking: numeric band on the digit payload of the name
    (digits DIV 100, probe fans to {bid-1, bid, bid+1}) — an equi-join
    whose candidate count is bounded by key density per block;
  - scoring: JVM ``levenshtein`` on normalized names, accepted by the
    EXACT integer test 100·dist ≤ SIM_PCT·maxlen;
  - ranking: Fellegi-Sunter-style integer composite
    2·distance + 5·nation-mismatch + 3·balance-mismatch, ties broken
    on customer_key — deterministic under any candidate arrival order;
  - per-record best match via a window partitioned by the incoming
    record, never global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: accept a candidate iff 100*distance <= SIM_PCT * max(len) — i.e.
#: normalized similarity >= 0.85, tested in exact integers
SIM_PCT = 15


def norm_name(col: str) -> Column:
    return F.lower(F.regexp_replace(F.col(col), "#", " "))


def band_id(col: str) -> Column:
    return F.expr(f"CAST(regexp_replace({col}, '[^0-9]', '') AS BIGINT) DIV 100")


def link_crm_records(crm: DataFrame, customer: DataFrame) -> DataFrame:
    """Left-link each CRM record (``crm_id``, ``name_dirty``,
    ``crm_nationkey``, ``crm_acctbal``, any passthrough columns) to its
    thresholded best ``customer`` match.

    Output: every ``crm`` column plus ``matched_customer_key``,
    ``match_distance``, ``_norm_dist`` (distance/maxlen as one IEEE
    division; NULL when unmatched) and ``matched``. Each record's
    answer depends only on that record and the (static) dimension, so
    any batch split of ``crm`` unions to the one-shot answer — the
    property the streaming twin relies on.
    """
    keyed = crm.withColumns(
        {"name_norm": norm_name("name_dirty"), "bid": band_id("name_dirty")}
    )
    dw = customer.select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_nationkey").alias("dw_nationkey"),
        F.col("c_acctbal").alias("dw_acctbal"),
        norm_name("c_name").alias("dw_norm"),
        band_id("c_name").alias("bid"),
    )
    # numeric-band blocking: the probe side fans out to the 3 adjacent
    # blocks, the dimension stays put — one equi-join shuffle on bid
    probes = keyed.select(
        "crm_id", "name_norm", "crm_nationkey", "crm_acctbal",
        F.explode(F.array(F.col("bid") - 1, F.col("bid"), F.col("bid") + 1)).alias("bid"),
    )
    dist = F.levenshtein("name_norm", "dw_norm")
    maxlen = F.greatest(F.length("name_norm"), F.length("dw_norm"))
    cand = (
        probes.join(dw, "bid")
        .select(
            "crm_id", "customer_key",
            dist.alias("dist"), maxlen.alias("maxlen"),
            (F.col("crm_nationkey") != F.col("dw_nationkey"))
            .cast("int").alias("nation_miss"),
            (F.abs(F.col("crm_acctbal") - F.col("dw_acctbal")) > F.lit(10.0))
            .cast("int").alias("bal_miss"),
        )
        .filter(F.lit(100) * F.col("dist") <= F.lit(SIM_PCT) * F.col("maxlen"))
    )
    # Fellegi-Sunter-style composite rank: name distance primary, nation
    # a strong corroborator (5 > the truth's worst composite 2·2, so a
    # wrong-nation exact name loses), balance a weak one (3 < 4 —
    # balances legitimately drift between systems, so an exact-name
    # same-nation collision still out-ranks a 2-edit truth: the audit's
    # deliberate residual wrong-match class). All-integer, deterministic
    w = Window.partitionBy("crm_id").orderBy(
        2 * F.col("dist") + 5 * F.col("nation_miss") + 3 * F.col("bal_miss"),
        "customer_key",
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return keyed.drop("name_norm", "bid").join(best, "crm_id", "left").select(
        *crm.columns,
        F.col("customer_key").alias("matched_customer_key"),
        F.col("dist").cast("int").alias("match_distance"),
        (F.col("dist").cast("double") / F.col("maxlen")).alias("_norm_dist"),
        F.col("customer_key").isNotNull().alias("matched"),
    )
