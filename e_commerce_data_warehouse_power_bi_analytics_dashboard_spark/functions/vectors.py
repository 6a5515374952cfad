"""Vector expression builders over ``array<float>`` embedding columns.

Dot products / cosine are computed as JVM-side higher-order-function
folds (zip_with + aggregate) in doubles — sequential left-to-right
summation, which matches DuckDB's list_dot_product/list_cosine loop, so
scores are bit-comparable across engines. At 100 TB this is the
vectorized-codegen path; a Pandas-UDF/numpy variant only wins when
batching many query vectors at once (see operators/similarity.py notes).
"""

from __future__ import annotations


def s_to_double(expr: str) -> str:
    """Spark SQL: float[] -> double[] (exact widening)."""
    return f"transform({expr}, x -> CAST(x AS DOUBLE))"


def s_dot(a: str, b: str) -> str:
    """Spark SQL: sequential-fold dot product of two double arrays."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"


def s_cosine(a: str, b: str) -> str:
    return f"({s_dot(a, b)}) / (sqrt({s_dot(a, a)}) * sqrt({s_dot(b, b)}))"


def s_norm(a: str) -> str:
    """Spark SQL: euclidean norm — the exact sub-expression s_cosine uses."""
    return f"sqrt({s_dot(a, a)})"


def s_cosine_prenorm(a: str, b: str, na: str, nb: str) -> str:
    """Cosine with PRE-COMPUTED norms: bit-identical to ``s_cosine``
    (same fold for the dot, same sqrt-then-multiply divisor, same IEEE
    op order) but the two self-dot folds are hoisted out of the pair
    loop — in an n×k cross/self-join each vector's norm is computed
    once instead of per pair, cutting ~2/3 of the fold work. Use this
    in every pair-heavy path; keep ``s_cosine`` for one-shot scoring."""
    return f"({s_dot(a, b)}) / ({na} * {nb})"


def o_cosine(a: str, b: str) -> str:
    """DuckDB twin (embedding cast to DOUBLE[] by the caller)."""
    return f"list_cosine_similarity({a}, {b})"


def srp_planes(nbits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane matrix for signed-random-
    projection LSH (Charikar 2002): entry (b, j) is the parity of
    md5("srp:b:j"). Hash-derived so the Spark plan and the DuckDB oracle
    materialize bit-identical planes with no shared RNG state."""
    import hashlib

    return [
        [1 if hashlib.md5(f"srp:{b}:{j}".encode()).digest()[0] & 1 else -1 for j in range(dim)]
        for b in range(nbits)
    ]


def s_plane_array(signs: list[int]) -> str:
    """Spark SQL literal double[] for one hyperplane."""
    return "array(" + ", ".join("1.0D" if s > 0 else "-1.0D" for s in signs) + ")"


def o_plane_array(signs: list[int]) -> str:
    """DuckDB twin literal."""
    return "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in signs) + "]::DOUBLE[]"
