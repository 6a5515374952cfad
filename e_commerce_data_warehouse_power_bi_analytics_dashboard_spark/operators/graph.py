"""Reusable fixed-point PageRank core (the distributed iteration behind
plans/graph_queries.py::pagerank_copurchase).

All arithmetic is integer at ``scale`` (see graph_queries' module
docstring for the determinism rationale): the distributed fit is
bit-identical to ANY faithful serial implementation of the same
recurrence — the property test (tests/test_graph.py) exercises exactly
that against a pure-Python twin on randomized DIRECTED and undirected
graphs, which a float-based PageRank could never pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pins import fresh_pins, pin

SCALE = 1_000_000_000_000
DAMP_NUM, BASE_NUM, DAMP_DEN = 85, 15, 100


def fixed_point_pagerank(
    edges: DataFrame, iters: int, salt_hubs: int = 0,
    broadcast_contrib: bool = True, broadcast_degree: bool = True,
    broadcast_rank: bool = True,
) -> DataFrame:
    """PageRank over a DIRECTED edge list ``(src, dst)`` (pass both
    orientations for an undirected graph) → ``(node, pr)`` with integer
    rank mass at ``SCALE``.

    The node universe is src ∪ dst. Per round, for EVERY node v:
        pr'(v) = (BASE·(SCALE div n)) div 100
                 + (DAMP · Σ_{u→v} pr(u) div outdeg(u)) div 100
    with the contribution sum defaulting to 0 for nodes without
    in-edges — so a source-only node keeps contributing its outgoing
    mass every round instead of silently vanishing after round 1 (the
    round-5 advisory), and a pure sink holds rank without contributing
    (the classic simplified sink treatment: lost mass is part of the
    truncation budget, no redistribution). Every op is integer, so
    partial-sum order cannot perturb the result.

    ``salt_hubs`` > 1 enables the skew mitigation for power-law hubs
    (one node receiving most edges): the per-edge contributions first
    partial-aggregate on (dst, salt) with a deterministic src-hash salt,
    then combine on dst — two thin integer-sum shuffles instead of one
    reducer absorbing the hub's whole in-edge list. Integer addition is
    order-independent, so the salted plan is BIT-IDENTICAL to the
    unsalted one (the property tests run both on the same graphs).

    Scale shape: the edge list, degree and node frames are invariant and
    pinned once per invocation (operators/pins.py — the registry releases
    the previous invocation's pins, so long-lived sessions don't
    accumulate cache); each round is one edges⋈rank shuffle plus a
    dst-keyed aggregation. ``broadcast_degree=True`` (default) joins the
    node-cardinality degree frame broadcast per round; pass False when
    the node table outgrows the broadcast limit (billion-node graphs) —
    degree is then pre-joined into the pinned edge frame ONCE (one extra
    co-partitioned shuffle at pin time, none per round). Both flags'
    plans are bit-identical in output (integer arithmetic — the property
    tests run all combinations on the same graphs).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    fresh_pins()
    # pin the edge frame at machine width (r12 — guide §2.5): the edge
    # build's tiny-byte shuffles otherwise leave the cached frame at
    # 1-2 AQE-coalesced partitions, so every round's join+contribution
    # scan ran nearly single-task at test scale; the one extra exchange
    # is paid once at pin time, each round reads the cached width
    width = edges.sparkSession.sparkContext.defaultParallelism
    if broadcast_degree:
        edges = pin(edges.select("src", "dst").repartition(width, "src"))
        deg = pin(
            edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
        )
    else:
        # billion-node fallback: degree rides the pinned edge frame, so
        # no per-round degree join at all (the division needs deg on the
        # per-edge row anyway) — one src-keyed window at pin time.
        from pyspark.sql.window import Window

        edges = pin(
            edges.select("src", "dst").repartition(width, "src").withColumn(
                "deg", F.count("*").over(Window.partitionBy("src")).cast("long")
            )
        )
        deg = None
    nodes = pin(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.groupBy().agg(F.count("*").cast("long").alias("nn"))

    pr = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"{SCALE} div nn").cast("long").alias("pr"))
    )
    for _ in range(iters):
        # broadcast the node-cardinality rank frame into the per-round
        # join (r12, default on): the edge list — the corpus-sized side
        # — is then never shuffled per round; one thin dst-keyed
        # integer-sum shuffle remains. ``broadcast_rank=False`` is the
        # billion-node fallback (shuffle join on src, the old shape) —
        # bit-identical output (integer arithmetic).
        pr_side = F.broadcast(pr) if broadcast_rank else pr
        joined = edges.join(pr_side, edges.src == pr.node)
        if deg is not None:
            joined = joined.join(F.broadcast(deg), "src")
        per_edge = joined.select(
            "src", "dst", F.expr("pr div deg").alias("c")
        )
        if salt_hubs > 1:
            # two-level salted sum: spread each hub's in-edges over
            # salt_hubs reducers first (deterministic src-hash salt),
            # then combine the per-salt partials — exact for integer sums
            contrib = (
                per_edge.withColumn(
                    "_salt", F.pmod(F.hash("src"), F.lit(salt_hubs))
                )
                .groupBy("dst", "_salt")
                .agg(F.sum("c").alias("c1"))
                .groupBy("dst")
                .agg(F.sum("c1").alias("contrib"))
            )
        else:
            contrib = per_edge.groupBy("dst").agg(F.sum("c").alias("contrib"))
        # contrib is node-cardinality (one row per dst with in-edges) —
        # broadcast it into the pinned node universe so the per-round
        # rank rebuild adds NO shuffle beyond the edges⋈rank join (for
        # billion-node graphs pass broadcast_contrib=False to fall back
        # to a node-keyed shuffle join)
        if broadcast_contrib:
            contrib = F.broadcast(contrib)
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.expr(f"({BASE_NUM} * ({SCALE} div nn)) div {DAMP_DEN}")
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(contrib, 0L)) div {DAMP_DEN}"
                    )
                ).cast("long").alias("pr"),
            )
        )
    return pr


def pagerank_reference(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Pure-Python serial twin of :func:`fixed_point_pagerank` — the
    property-test oracle. Same integer recurrence over the same
    src ∪ dst node universe (missing contributions default to 0), no
    Spark."""
    from collections import defaultdict

    deg: dict[int, int] = defaultdict(int)
    nodes: set[int] = set()
    for s, d in edges:
        deg[s] += 1
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        contrib: dict[int, int] = defaultdict(int)
        for s, d in edges:
            contrib[d] += pr[s] // deg[s]
        pr = {
            v: (BASE_NUM * (SCALE // n)) // DAMP_DEN
            + (DAMP_NUM * contrib.get(v, 0)) // DAMP_DEN
            for v in nodes
        }
    return dict(pr)


def triangle_census(und: DataFrame, broadcast_adj: bool = True) -> DataFrame:
    """Degree-ordered triangle counting over an undirected edge set
    (Suri/Vassilvitskii orientation + adjacency-intersection closing):
    ``und`` holds one row per undirected edge as (pa, pb) with pa < pb,
    deduplicated.

    Every edge is oriented from its lower-(degree, id) endpoint to the
    higher — the orientation bounds per-node out-degree by O(sqrt(m))
    regardless of hub degree, so a star-graph hub cannot generate deg^2
    wedges. Triangles are closed by ADJACENCY INTERSECTION (r12 —
    before/after plans in plans/r12/, numbers in OPTIMIZATION_r12.md):
    each triangle {s→m, s→t, m→t} has exactly one edge (s→m, source to
    middle) whose two endpoints BOTH have the sink t in their oriented
    out-neighbor list, so

        n_triangles = Σ over oriented edges (u→v) |N+(u) ∩ N+(v)|

    counts every triangle exactly once. The old plan enumerated every
    oriented wedge as a ROW (41.1M rows at sf0.1, 410.9M at sf1) and
    closed it with a second shuffled equi-join; the intersection form
    never materializes the wedge rows — the same Σ outdeg² element
    visits happen inside one codegen'd array_intersect per edge, and
    the two wedge/closing exchanges disappear. The out-neighbor lists
    are bounded by the orientation's O(sqrt(m)) cap (max 97 at sf0.1
    AND sf1 — the audit column), so an adjacency row is at most a few
    KB at any corpus size; the adjacency table is node-cardinality and
    joins back to the edge list on src and on dst (broadcast when it
    fits, plain equi-joins — never all-pairs — when it does not).

    The edge list and oriented frame feed multiple legs — pinned via
    the session registry so the upstream edge build runs once. The
    expansion stage is repartitioned to machine width: the exchange
    carries the m-row edge list once, 1/outdeg of the intersection
    work downstream (guide §2.5 — at sf0.1 the whole fan-out otherwise
    ran at the single-file scan's parallelism of ONE task).
    Property-tested against a brute-force itertools twin on randomized
    graphs (tests/test_graph.py).
    """
    from .pins import fresh_pins, pin

    fresh_pins()
    und = pin(und)
    deg = (
        und.select(F.col("pa").alias("node"))
        .unionAll(und.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    oriented = (
        und.join(deg.select(F.col("node").alias("pa"), F.col("deg").alias("da")), "pa")
        .join(deg.select(F.col("node").alias("pb"), F.col("deg").alias("db")), "pb")
        .select(
            F.when(lower_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(lower_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        )
    )
    deg = pin(deg)
    oriented = pin(
        oriented.repartition(und.sparkSession.sparkContext.defaultParallelism)
    )
    adj = pin(
        oriented.groupBy("src").agg(
            F.array_sort(F.collect_list("dst")).alias("nb")
        )
    )
    # ``broadcast_adj=False`` is the billion-node fallback: the
    # adjacency table (node-cardinality, rows capped at O(sqrt(m))
    # neighbors) then attaches through two ordinary equi-joins instead
    # of a broadcast — bit-identical output (integer count).
    adj_src = adj.select("src", F.col("nb").alias("nb_src"))
    adj_dst = adj.select(F.col("src").alias("dst"), F.col("nb").alias("nb_dst"))
    if broadcast_adj:
        adj_src, adj_dst = F.broadcast(adj_src), F.broadcast(adj_dst)
    tri = (
        oriented.join(adj_src, "src")
        .join(adj_dst, "dst")
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("nb_src", "nb_dst"))), F.lit(0)
            )
            .cast("long")
            .alias("n_triangles")
        )
    )
    census = und.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.expr("deg * (deg - 1) DIV 2")).cast("long").alias("n_wedges"),
        )
    )
    # fan-out audit (r12 — verdict #5): the ORIENTED wedge count is the
    # exact number of candidate pairs the wedge join enumerates and the
    # max oriented out-degree is the per-node fan-out cap the
    # degree-ordering guarantees (O(sqrt(m)) — a hub cannot exceed it).
    # Emitted so the scale claim is measured, not asserted: at the sf1
    # rehearsal both scale exactly linearly (41.1M -> 410.9M wedges,
    # max out-degree 97 at both scales) — the 8.4x wall decade IS the
    # 10x work decade, no skew, no blowup.
    ow = (
        oriented.groupBy("src")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) DIV 2")).cast("long")
            .alias("n_oriented_wedges"),
            F.max("c").cast("long").alias("max_oriented_outdeg"),
        )
    )
    return tri.crossJoin(F.broadcast(census)).crossJoin(F.broadcast(ow)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_oriented_wedges",
        "max_oriented_outdeg",
        "n_triangles",
        (F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")).alias("transitivity"),
    )


def triangle_census_reference(edges: list[tuple[int, int]]) -> dict:
    """Brute-force serial twin of :func:`triangle_census` — O(n^3)
    itertools enumeration, for property tests only."""
    from itertools import combinations

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in und for n in e})
    deg = {n: 0 for n in nodes}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    outdeg = {n: 0 for n in nodes}
    for a, b in und:
        src = a if (deg[a], a) < (deg[b], b) else b
        outdeg[src] += 1
    return {
        "n_nodes": len(nodes),
        "n_edges": len(und),
        "n_wedges": wedges,
        "n_oriented_wedges": sum(c * (c - 1) // 2 for c in outdeg.values()),
        "max_oriented_outdeg": max(outdeg.values()),
        "n_triangles": tri,
        "transitivity": 3.0 * tri / wedges if wedges else None,
    }
