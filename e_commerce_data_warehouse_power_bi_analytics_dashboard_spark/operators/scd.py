"""Slowly-changing-dimension (Type 2) building blocks and the as-of
join — the temporal layer a warehouse needs once dimensions change
(the reference's upsert, ETL.sql:304-315, is SCD Type 1: overwrite; these
operators keep history instead).

Both operators are one-shuffle plans keyed on the dimension key:

- ``scd2_build`` turns a change feed into effective-dated version rows
  (change suppression via lag comparison, interval close via lead — two
  window passes over the SAME (key, time) sort, so Catalyst reuses one
  Exchange+Sort).
- ``asof_join`` attaches the version in effect at each fact event WITHOUT
  a range join: union the fact events and dimension versions, sort each
  key's timeline once, and carry version attributes forward with
  last(ignorenulls) — O((|fact|+|dim|) log) per key and a single shuffle,
  where the naive key+range join explodes on hot keys. This is the
  standard Spark formulation of time-series as-of (cf. pandas merge_asof
  semantics); DuckDB's native ASOF JOIN is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_build(
    changes: DataFrame, key: str, attrs: list[str], effective_col: str
) -> DataFrame:
    """Change feed (key, attrs..., effective_date) → SCD2 version rows
    (key, attrs..., valid_from, valid_to, is_current).

    Consecutive rows whose attributes are all unchanged are SUPPRESSED
    (a re-delivered snapshot is not a new version); intervals are
    half-open [valid_from, valid_to) with NULL valid_to on the current
    row.
    """
    order = Window.partitionBy(key).orderBy(effective_col)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(order)
        changed = changed | ~(prev.eqNullSafe(F.col(a)))
    real = (
        changes.withColumn("_first", F.lag(effective_col).over(order).isNull())
        .withColumn("_changed", changed)
        .filter(F.col("_first") | F.col("_changed"))
        .drop("_first", "_changed")
    )
    # lead over the surviving versions closes each interval
    order2 = Window.partitionBy(key).orderBy(effective_col)
    return (
        real.withColumn("valid_from", F.col(effective_col))
        .withColumn("valid_to", F.lead("valid_from").over(order2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(effective_col)
    )


def asof_join(
    fact: DataFrame, dim: DataFrame, key: str,
    fact_time: str, dim_time: str, dim_attrs: list[str],
) -> DataFrame:
    """Left as-of join: each fact row gets the ``dim_attrs`` of the
    latest dim version with ``dim_time <= fact_time`` (ties: the version
    effective AT the event time is visible). Facts before the first
    version keep NULL attributes.

    Union-and-carry-forward plan: one shuffle on ``key``, one sort per
    key timeline, no non-equi join — the shape that survives hot keys at
    100 TB.

    Preconditions: ``_t``/``_side``/``_ver`` are reserved working names
    (ValueError on collision). If ``dim`` carries several versions of a
    key at the SAME ``dim_time``, the one sorting last by attribute
    struct wins — deterministic, but callers who care which one should
    dedupe upstream (the attrs must be orderable types for the
    tie-break; they are for every SCD dimension in this repo).
    """
    reserved = {"_t", "_side", "_ver"}
    for side, df in (("fact", fact), ("dim", dim)):
        hit = reserved.intersection(df.columns)
        if hit:
            raise ValueError(
                f"asof_join: {side} columns {sorted(hit)} collide with "
                f"reserved working names {sorted(reserved)} — rename them first"
            )
    # one non-null STRUCT per dim row (not one column per attr): carrying
    # the whole version forward keeps an attr that is legitimately NULL
    # in a newer version from falling through to an older version's value
    marked_dim = dim.select(
        F.col(key), F.col(dim_time).alias("_t"), F.lit(0).alias("_side"),
        F.struct(*[F.col(a) for a in dim_attrs]).alias("_ver"),
    )
    marked_fact = fact.withColumn("_t", F.col(fact_time)).withColumn("_side", F.lit(1))
    u = marked_fact.unionByName(marked_dim, allowMissingColumns=True)
    # dim rows (_side=0) sort before fact rows at equal _t, so a version
    # effective exactly at the event time is already visible; _ver as the
    # final sort key makes duplicate same-timestamp versions resolve
    # deterministically (struct-wise max wins) instead of by task order
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side", F.col("_ver").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in marked_fact.columns if c not in ("_t", "_side")],
        F.col("_side"),
        F.last("_ver", ignorenulls=True).over(w).alias("_ver"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in fact.columns],
            *[F.col(f"_ver.{a}").alias(a) for a in dim_attrs],
        )
    )
