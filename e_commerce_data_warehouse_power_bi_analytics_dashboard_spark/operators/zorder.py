"""Morton (Z-order) curve clustering expression.

Lives in operators/ so both the plain-parquet layout entries
(plans/layout.py) and the ACID table format's OPTIMIZE ZORDER
(operators/table_format.py compact(zorder_by=...)) share one
implementation. The reference's multi-column index study is
`Iteration 3/Group No.6_Indexing_Partitioning.sql:51-75` (composite
B-tree); on an immutable lake the analog is interleaved-bit sort order
+ per-file min/max stats, the layout trick Delta/Iceberg expose as
OPTIMIZE ZORDER BY.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def zvalue(a: str, b: str, bits: int = 16) -> F.Column:
    """Morton z-value: interleave the low ``bits`` bits of two non-negative
    int SQL expressions (a's bits land on odd positions). Pure JVM
    higher-order expression — whole-stage-codegen'd, no UDF.

    Sorting by z-value clusters rows that are close in BOTH dimensions,
    so parquet min/max row-group stats prune on either predicate — the
    multi-dim analog of a single-dim range sort.

    Size ``bits`` to cover the key domain: values wider than ``bits``
    alias onto their low bits (e.g. custkey 100 and 100 + 2**bits
    interleave identically), which never changes query RESULTS — the
    layout only affects clustering — but silently destroys the per-file
    min/max locality the z-order exists to create.
    """
    if not 1 <= bits <= 31:
        # 2*bits interleaved bits must fit a signed int64 (and the
        # shifted bit positions 2*i+1 stay < 63)
        raise ValueError(f"bits={bits} must be in [1, 31]")
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc | shiftleft(shiftright(CAST({a} AS BIGINT), i) & 1, 2*i+1)"
        f"    | shiftleft(shiftright(CAST({b} AS BIGINT), i) & 1, 2*i))"
    )


def zvalue_n(cols, bits: int | None = None) -> F.Column:
    """N-dimensional Morton z-value: interleave the low ``bits`` bits of
    each int expression in ``cols`` (earlier columns take the more
    significant position within each bit group, matching zvalue's 2-D
    layout). ``bits`` defaults to the largest fitting a signed int64
    (63 // n). Same aliasing caveat as zvalue: size bits to the widest
    key domain or locality silently degrades. Still a pure JVM
    higher-order expression — no UDF at any dimensionality."""
    cols = list(cols)
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue_n needs at least 2 columns")
    if bits is None:
        bits = 63 // n
    if not 1 <= bits * n <= 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits "
            "must fit a signed int64"
        )
    terms = " | ".join(
        f"shiftleft(shiftright(CAST({c} AS BIGINT), i) & 1, "
        f"{n}*i+{n - 1 - j})"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc | {terms})"
    )
