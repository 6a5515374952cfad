"""Focused pins for the r12 optimization-round internals changes
(OPTIMIZATION_r12.md): driver-state iterative rounds, the
adjacency-intersection triangle closing, and the broadcast-rank
PageRank rounds must be bit-equivalent to the shapes they replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.graph import (
    fixed_point_pagerank,
    pagerank_reference,
    triangle_census,
    triangle_census_reference,
)
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.similarity import (
    _round_half_up_6,
)


def test_round_half_up_6_matches_spark_round(spark):
    """The driver-side round used by the iterative fits (pca/lr/kmeans
    state updates) must be bit-identical to F.round(col, 6) — including
    exact halfway points, negatives, and values whose nearest double is
    NOT the decimal the literal suggests."""
    vals = [
        0.1234565, 0.1234575, -0.1234565, -0.1234575,  # halfway-looking
        1.0000005, -1.0000005, 0.0, -0.0, 0.125,
        1e-7, -1e-7, 3.9999995, 123456.7890123, -0.9999999,
        0.30000000000000004, 2.675, -2.675, 1.0 / 3.0, -1.0 / 3.0,
    ]
    rows = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    ).select("i", F.round("v", 6).alias("r")).collect()
    got = {r["i"]: r["r"] for r in rows}
    for i, v in enumerate(vals):
        assert _round_half_up_6(v) == got[i], (
            f"driver round diverges from F.round at {v!r}: "
            f"{_round_half_up_6(v)!r} != {got[i]!r}"
        )


def test_round_half_up_6_randomized_sweep(spark):
    """r12 advisory: the 19-value pin grid can't rule out a rare value
    whose JVM Double.toString rendering differs from Python repr
    (pre-JDK-19 Double.toString was not guaranteed shortest — JDK
    4511638). Sweep 10k seeded doubles across the magnitude range the
    iterative fits actually produce (weights/means/eigencomponents:
    ~1e-9..1e6, both signs, plus near-halfway constructions) against
    F.round. Documented assumption: the bundled JRE renders doubles
    shortest-round-trip (JDK 19+ behavior; Spark 4 requires 17+, and
    the pin grid + this sweep would catch a divergent runtime)."""
    import random

    rng = random.Random(0x5EED13)
    vals: list[float] = []
    for _ in range(9000):
        mag = 10.0 ** rng.uniform(-9, 6)
        vals.append(rng.choice((-1.0, 1.0)) * rng.random() * mag)
    # adversarial tail: values engineered to sit at/near the 6th-decimal
    # halfway point where HALF_UP vs binary-expansion rounding diverges
    for _ in range(1000):
        base = rng.randrange(-10_000_000, 10_000_000)
        vals.append(base / 1e6 + rng.choice((5, -5, 4.999999, 5.000001)) / 1e13)
    rows = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    ).select("i", "v", F.round("v", 6).alias("r")).collect()
    diverged = [
        (r["v"], _round_half_up_6(r["v"]), r["r"])
        for r in rows
        if _round_half_up_6(r["v"]) != r["r"]
    ]
    assert not diverged, f"driver round diverges from F.round: {diverged[:5]}"


def _und(edges):
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def test_triangle_census_auto_broadcast_gate(spark):
    """r13 (VERDICT r12 #3): broadcast_adj=None picks the strategy from
    a measured size bound vs autoBroadcastJoinThreshold. Forcing the
    threshold to 1 byte must route the AUTO path onto the equi-join
    fallback (no broadcast of the adjacency) with identical output."""
    import random

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.graph import (
        _fits_broadcast,
    )

    rng = random.Random(77)
    und = _und((rng.randrange(20), rng.randrange(20)) for _ in range(60))
    df = spark.createDataFrame(sorted(und), "pa long, pb long")
    ref = triangle_census_reference(sorted(und))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        assert not _fits_broadcast(spark, 1000)
        forced = triangle_census(df).collect()[0].asDict()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert _fits_broadcast(spark, 1000)  # default 10 MB: tiny fits
    auto = triangle_census(df).collect()[0].asDict()
    for got in (forced, auto):
        assert {k: got[k] for k in ref if k != "transitivity"} == {
            k: ref[k] for k in ref if k != "transitivity"
        }


def test_pagerank_auto_broadcast_gate_forced_threshold(spark):
    """Same gate for the PageRank rounds: a 1-byte threshold must push
    the AUTO path onto the shuffle-join fallbacks, bit-identically."""
    import random

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.graph import (
        fixed_point_pagerank,
        pagerank_reference,
    )

    rng = random.Random(31)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    ref = pagerank_reference(edges, 2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        got = {
            r["node"]: r["pr"] for r in fixed_point_pagerank(df, 2).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == ref


@pytest.mark.parametrize("broadcast_adj", [True, False])
def test_triangle_census_fallback_flag_bit_identical(spark, broadcast_adj):
    """The billion-node equi-join fallback (broadcast_adj=False) must
    produce the identical census as the broadcast default — same
    adjacency-intersection closing, different attachment only."""
    import random

    rng = random.Random(1207)
    und = _und(
        (rng.randrange(25), rng.randrange(25)) for _ in range(90)
    )
    df = spark.createDataFrame(sorted(und), "pa long, pb long")
    got = triangle_census(df, broadcast_adj=broadcast_adj).collect()[0].asDict()
    ref = triangle_census_reference(sorted(und))
    assert {k: got[k] for k in ref if k != "transitivity"} == {
        k: ref[k] for k in ref if k != "transitivity"
    }
    if ref["transitivity"] is not None:
        assert got["transitivity"] == ref["transitivity"]


@pytest.mark.parametrize("broadcast_rank", [True, False])
def test_pagerank_broadcast_rank_flag_bit_identical(spark, broadcast_rank):
    """broadcast_rank=True (r12 default: the edge list is never shuffled
    per round) walks the identical integer recurrence as the shuffle-join
    fallback — pinned against the serial twin."""
    import random

    rng = random.Random(43)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["pr"]
        for r in fixed_point_pagerank(
            df, iters=3, broadcast_rank=broadcast_rank
        ).collect()
    }
    assert got == pagerank_reference(edges, iters=3)
