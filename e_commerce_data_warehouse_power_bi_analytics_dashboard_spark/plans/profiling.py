"""Column-level profiling over the documents table: the data-quality
inspection step a warehouse/pipeline runs before trusting a source (the
same spirit as the reference's D1-D10 validation suite, applied to the
training-corpus tables).

One scan computes every per-column statistic as a single wide aggregate
(null counts, distinct counts, min/max), then a ``stack`` unpivot turns
the 1-row aggregate into one row per column — the profile never rescans
per column, which is the difference between 1 and N passes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import read_table
from .catalog import register

#: profiled columns of documents (text excluded: min/max of a free-text
#: blob is meaningless and drags the whole payload through the agg)
_COLS = ["doc_id", "lang", "source", "n_chars"]


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Generic single-pass profiler: (column_name, n_rows, n_nulls,
    n_distinct, min_val, max_val) with min/max rendered as strings."""
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


@register(
    "profile_documents",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM documents
        """
        for c in _COLS
    ),
    tags=("llm", "profiling", "validation"),
    doc="Single-pass column profile of the documents corpus (null/distinct "
        "counts, min/max per column via one wide aggregate + stack "
        "unpivot); the oracle recomputes each column independently",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(read_table(spark, sf_dir, "documents"), _COLS)


#: embedding-profile quantization scale (the PCA-entry discipline:
#: exact-integer moment sums; floor(x*Q + 0.5) is deterministic IEEE in
#: both engines)
_EPROF_Q = 10_000


@register(
    "profile_embeddings",
    oracle=f"""
        WITH cells AS (
            SELECT s.i AS pos,
                   CAST(embedding[s.i] AS DOUBLE) AS x,
                   CAST(floor(CAST(embedding[s.i] AS DOUBLE) * {_EPROF_Q} + 0.5)
                        AS BIGINT) AS q
            FROM embeddings, unnest(range(1, 65)) AS s(i)
        )
        SELECT CAST(pos AS INT) AS pos,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS DOUBLE) / (COUNT(*) * {_EPROF_Q}.0) AS mean,
               sqrt((COUNT(*) * SUM(q * q) - SUM(q) * SUM(q))
                     / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * {_EPROF_Q}.0 * {_EPROF_Q}))
                   AS std,
               MIN(x) AS vmin,
               MAX(x) AS vmax
        FROM cells GROUP BY pos
    """,
    tags=("llm", "profiling", "A4", "A5"),
    doc="Per-dimension embedding profile (mean/std/min/max for each of "
        "the 64 coordinates) — the drift/normalization diagnostic an "
        "embedding pipeline runs before indexing (dimension collapse, "
        "un-normalized batches and clipped values all show here; "
        "companion to profile_documents and pca_power_iteration). "
        "Exactness: moments accumulate over quantized INTEGERS (the "
        "PCA discipline); mean/std are emitted as the RAW single-IEEE-"
        "division doubles of those exact sums (bit-identical across "
        "engines — a round() here would reintroduce the banned "
        "round-a-double-quotient tie hazard, which sf0.1 actually "
        "hit at the 6th decimal); sqrt is correctly rounded; min/max "
        "compare raw floats exactly. One posexplode + one 64-group "
        "aggregation with map-side partials.",
)
def profile_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos0", "x"
        )
    ).select(
        (F.col("pos0") + 1).alias("pos"),
        "x",
        F.expr(f"CAST(floor(x * {_EPROF_Q} + 0.5) AS BIGINT)").alias("q"),
    )
    n = F.count("*")
    return (
        cells.groupBy("pos")
        .agg(
            n.cast("long").alias("n"),
            (F.sum("q").cast("double") / (n * float(_EPROF_Q))).alias("mean"),
            F.sqrt(
                (n * F.sum(F.col("q") * F.col("q")) - F.sum("q") * F.sum("q"))
                / (
                    n.cast("double")
                    * n
                    * float(_EPROF_Q)
                    * float(_EPROF_Q)
                )
            ).alias("std"),
            F.min("x").alias("vmin"),
            F.max("x").alias("vmax"),
        )
        .select(F.col("pos").cast("int").alias("pos"), "n", "mean", "std", "vmin", "vmax")
    )
