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


def o_cosine(a: str, b: str) -> str:
    """DuckDB twin (embedding cast to DOUBLE[] by the caller)."""
    return f"list_cosine_similarity({a}, {b})"
