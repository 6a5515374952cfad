"""Reusable fixed-point PageRank core (the distributed iteration behind
plans/graph_queries.py::pagerank_copurchase).

All arithmetic is integer at ``scale`` (see graph_queries' module
docstring for the determinism rationale): the distributed fit is
bit-identical to ANY faithful serial implementation of the same
recurrence — the property test (tests/test_graph.py) exercises exactly
that against a pure-Python twin on randomized graphs, which a
float-based PageRank could never pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000
DAMP_NUM, BASE_NUM, DAMP_DEN = 85, 15, 100


def fixed_point_pagerank(edges: DataFrame, iters: int) -> DataFrame:
    """PageRank over a DIRECTED edge list ``(src, dst)`` (pass both
    orientations for an undirected graph) → ``(node, pr)`` with integer
    rank mass at ``SCALE``.

    Per round: pr'(v) = (BASE·(SCALE div n)) div 100
                        + (DAMP · Σ_{u→v} pr(u) div deg(u)) div 100 —
    every op integer, so partial-sum order cannot perturb the result.
    Nodes are the edge sources (an undirected graph's isolated nodes are
    out of scope — they hold base mass only).

    Scale shape: the edge list and degree frame are invariant and
    persisted once (Pregel invariant-frame pin; rebuildable — persist
    marks lineage, it does not truncate); each round is one edges⋈rank
    shuffle plus a dst-keyed aggregation; degree broadcasts (pre-join it
    instead if the node table outgrows the broadcast limit).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    edges = edges.select("src", "dst").persist()
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg")).persist()
    nn = deg.groupBy().agg(F.count("*").cast("long").alias("nn"))

    pr = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"{SCALE} div nn").cast("long").alias("pr"))
    )
    for _ in range(iters):
        pr = (
            edges.join(pr, edges.src == pr.node)
            .join(F.broadcast(deg), "src")
            .select("dst", F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                (
                    F.expr(f"({BASE_NUM} * ({SCALE} div nn)) div {DAMP_DEN}")
                    + F.expr(f"({DAMP_NUM} * contrib) div {DAMP_DEN}")
                ).cast("long").alias("pr"),
            )
        )
    return pr


def pagerank_reference(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Pure-Python serial twin of :func:`fixed_point_pagerank` — the
    property-test oracle. Same integer recurrence, no Spark."""
    from collections import defaultdict

    deg: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = sorted(deg)
    n = len(nodes)
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        contrib: dict[int, int] = defaultdict(int)
        for s, d in edges:
            contrib[d] += pr[s] // deg[s]
        pr = {
            v: (BASE_NUM * (SCALE // n)) // DAMP_DEN
            + (DAMP_NUM * contrib[v]) // DAMP_DEN
            for v in contrib
        }
    return dict(pr)
