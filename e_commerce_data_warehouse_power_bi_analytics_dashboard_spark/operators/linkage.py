"""Record-linkage operator core: TWO-PASS blocking union + composite-
rank best match of keyless records against a reference dimension.

Extracted from plans/entity_resolution.py (which documents the full
design, the synthesized truth fixture, and the DuckDB oracle twin) so
the streaming surface (streaming/er.py) can run the identical operator
per micro-batch. See that module's docstring for the 100 TB design
notes; the short version:

  - blocking pass 1 (BAND): numeric band on the digit payload of the
    name (digits DIV 100, probe fans to {bid-1, bid, bid+1}) — catches
    any typo displacing the value by < 100 (e.g. the low-digit
    transposition class, displacement <= 81), misses high-digit
    corruption;
  - blocking pass 2 (SUFFIX, r8): exact block on the LOW 6 digits
    (digits MOD 1e6) — catches corruption of any of the high 3 digits
    (value displaced by a multiple of 1e6, far outside the band),
    misses low-digit typos. The UNION of the two passes covers both
    modeled typo classes with recall 1.0; er_linkage_quality reports
    per-pass truth reach, proving the union strictly dominates either
    pass alone. Both passes are equi-joins whose candidate count is
    bounded by key density per block — never all-pairs; duplicate
    (record, candidate) pairs from overlapping passes carry identical
    payloads, so the best-match window is unaffected (no dedup shuffle
    needed);
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

#: accept a candidate iff 100*distance <= SIM_PCT * max(len) — i.e.
#: normalized similarity >= 0.85, tested in exact integers
SIM_PCT = 15


def norm_name(col: str) -> Column:
    return F.lower(F.regexp_replace(F.col(col), "#", " "))


def band_id(col: str) -> Column:
    return F.expr(f"CAST(regexp_replace({col}, '[^0-9]', '') AS BIGINT) DIV 100")


def suffix_id(col: str) -> Column:
    """Pass-2 blocking key: the low 6 digits of the name's digit
    payload. Invariant under corruption of any higher digit — the class
    the ±1 band provably cannot reach."""
    return F.expr(f"CAST(regexp_replace({col}, '[^0-9]', '') AS BIGINT) % 1000000")


#: the cheap prune's alphabet: digit characters. Any subset of the
#: alphabet yields a SOUND levenshtein lower bound (see _CHEAP_LB),
#: and digits are where blocked near-misses actually differ.
_LB_CHARS = "0123456789"


def _char_counts(col: str, prefix: str) -> dict[str, Column]:
    """Per-character occurrence counts for the prune alphabet — ten
    integer columns computed ONCE per row per side (linear work),
    consulted per candidate pair (a 10-term integer sum)."""
    return {
        f"{prefix}{ch}": (
            F.length(col) - F.length(F.regexp_replace(col, ch, ""))
        ).cast("int")
        for ch in _LB_CHARS
    }


def _cheap_lb_keep(a_prefix: str, b_prefix: str, maxlen: Column) -> Column:
    """SOUND pre-levenshtein prune (r12 — verdict #1): every edit
    operation changes a string's character multiset by at most 2
    (substitution swaps one char for another; insert/delete moves one),
    so levenshtein(a, b) ≥ Δ/2 where Δ = Σ_c |count_a(c) − count_b(c)|
    — and restricting the sum to ANY alphabet subset only shrinks Δ,
    keeping the bound valid. A pair can pass the accept test
    100·dist ≤ SIM_PCT·maxlen only if Δ ≤ 2·(SIM_PCT·maxlen DIV 100);
    anything beyond is rejected BEFORE the O(len²) levenshtein runs.
    On the banded fixture this eliminates most of the ±1-fan candidates
    (they differ in ≥3 digit positions) at the cost of integer
    arithmetic — semantics-identical, whole-stage codegen."""
    delta = sum(
        F.abs(F.col(f"{a_prefix}{ch}") - F.col(f"{b_prefix}{ch}"))
        for ch in _LB_CHARS
    )
    return delta * F.lit(100) <= F.lit(2 * SIM_PCT) * maxlen


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
        {
            "name_norm": norm_name("name_dirty"),
            "bid": band_id("name_dirty"),
            "sid": suffix_id("name_dirty"),
        }
    ).withColumns(_char_counts("name_norm", "_ca"))
    dw = customer.select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_nationkey").alias("dw_nationkey"),
        F.col("c_acctbal").alias("dw_acctbal"),
        norm_name("c_name").alias("dw_norm"),
        band_id("c_name").alias("bid"),
        suffix_id("c_name").alias("sid"),
    ).withColumns(_char_counts("dw_norm", "_cb"))
    dist = F.levenshtein("name_norm", "dw_norm")
    maxlen = F.greatest(F.length("name_norm"), F.length("dw_norm"))
    _probe_cols = [
        "crm_id", "name_norm", "crm_nationkey", "crm_acctbal",
        *[f"_ca{ch}" for ch in _LB_CHARS],
    ]

    def _score(joined: DataFrame) -> DataFrame:
        # cheap multiset bound FIRST (integer-only), levenshtein and
        # the exact accept test only on survivors
        return joined.filter(
            _cheap_lb_keep("_ca", "_cb", maxlen)
        ).select(
            "crm_id", "customer_key",
            dist.alias("dist"), maxlen.alias("maxlen"),
            (F.col("crm_nationkey") != F.col("dw_nationkey"))
            .cast("int").alias("nation_miss"),
            (F.abs(F.col("crm_acctbal") - F.col("dw_acctbal")) > F.lit(10.0))
            .cast("int").alias("bal_miss"),
        ).filter(F.lit(100) * F.col("dist") <= F.lit(SIM_PCT) * F.col("maxlen"))

    # r12 (guide §2.5 — before/after plans in plans/r12/, numbers in
    # OPTIMIZATION_r12.md): both blocking joins broadcast the dimension
    # side, so the candidate EXPANSION (~block-density × probes pairs,
    # each paying the multiset prune and surviving pairs the O(len²)
    # levenshtein) runs at the PROBE side's partitioning — for a
    # single-file CRM extract that was ONE task doing all the scoring.
    # Repartition the probe side to machine width first: the exchange
    # carries one thin row per probe record, 1/block-density of the
    # downstream scoring work, so the trade holds at any batch size.
    width = crm.sparkSession.sparkContext.defaultParallelism
    # pass 1 — numeric-band blocking: the probe side fans out to the 3
    # adjacent blocks, the dimension stays put — one equi-join on bid
    probes = keyed.select(
        *_probe_cols,
        F.explode(F.array(F.col("bid") - 1, F.col("bid"), F.col("bid") + 1)).alias("bid"),
    ).repartition(width)
    band_cand = _score(probes.join(dw.drop("sid"), "bid"))
    # pass 2 — low-6-digit suffix blocking: plain equi-join on sid,
    # reaching the high-digit-corruption class the band cannot. A pair
    # found by both passes appears twice with IDENTICAL payload, which
    # the best-match aggregate absorbs without a dedup shuffle.
    suffix_cand = _score(
        keyed.select(*_probe_cols, "sid").repartition(width).join(dw.drop("bid"), "sid")
    )
    cand = band_cand.unionByName(suffix_cand)
    # Fellegi-Sunter-style composite rank: name distance primary, nation
    # a strong corroborator (5 > the truth's worst composite 2·2, so a
    # wrong-nation exact name loses), balance a weak one (3 < 4 —
    # balances legitimately drift between systems, so an exact-name
    # same-nation collision still out-ranks a 2-edit truth: the audit's
    # deliberate residual wrong-match class). All-integer, deterministic.
    # Implemented as min(struct) — lexicographic struct ordering IS the
    # (composite, customer_key) rank — instead of a row_number window:
    # the hash aggregate partial-combines MAP-SIDE, so the shuffle
    # carries one row per CRM record, not every accepted candidate
    # (~100× less at the fixture's block density; the window had to
    # shuffle-sort them all). r12 — verdict #1.
    best = (
        cand.groupBy("crm_id")
        .agg(F.min(F.struct(
            (2 * F.col("dist") + 5 * F.col("nation_miss")
             + 3 * F.col("bal_miss")).alias("score"),
            F.col("customer_key"),
            F.col("dist"),
            F.col("maxlen"),
        )).alias("b"))
        .select(
            "crm_id", F.col("b.customer_key").alias("customer_key"),
            F.col("b.dist").alias("dist"), F.col("b.maxlen").alias("maxlen"),
        )
    )
    return keyed.select(*crm.columns).join(best, "crm_id", "left").select(
        *crm.columns,
        F.col("customer_key").alias("matched_customer_key"),
        F.col("dist").cast("int").alias("match_distance"),
        (F.col("dist").cast("double") / F.col("maxlen")).alias("_norm_dist"),
        F.col("customer_key").isNotNull().alias("matched"),
    )
