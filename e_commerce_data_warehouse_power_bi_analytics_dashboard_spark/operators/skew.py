"""Skew-mitigation operators: salted joins and salted aggregation.

At 100 TB a handful of hot keys (one giant customer, one dominant
country) can put an entire shuffle partition on one executor. Two
standing mitigations, both plain DataFrame transforms:

  - AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
    on by default in session.py) — runtime splitting of oversized
    partitions; needs no code changes.
  - **Salting** (this module) — a deterministic plan-level rewrite for
    when AQE can't help (e.g. skewed aggregation keys feeding a single
    reducer, or fixed partitioning requirements downstream).

Salted join: the big side gets ``salt = pmod(hash(whole row), n)``, the
small side is replicated once per salt value, and the join key becomes
(key, salt) — the hot key's rows spread over n reducers. Results are
identical to the unsalted join (the replication ⋈ salt-match is a
partition of the original match set); the catalog entry proves it
against an unsalted DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, *hash_cols: str) -> DataFrame:
    """Deterministic salt column in [0, n_salts): pmod(hash(cols), n).

    Hash inputs default to all columns — any stable per-row spread works;
    determinism keeps results reproducible run-to-run.
    """
    cols: tuple[str, ...] = hash_cols or tuple(df.columns)
    return df.withColumn("_salt", F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts)))


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the (small) side with the salt domain: one copy per salt."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    return df.withColumn("_salt", F.explode(salts))


def salted_join(
    big: DataFrame, small: DataFrame, on: str | list[str], n_salts: int = 8,
    how: str = "inner",
) -> Column | DataFrame:
    """Skew-safe equi-join: big ⋈ small on (on..., _salt).

    The big side's hot keys spread across ``n_salts`` reducers; the small
    side is replicated n_salts times (cheap — it is the small side).
    Equivalent to ``big.join(small, on, how)`` for inner/left joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, n_salts)
    s = replicate_salts(small, n_salts)
    return b.join(s, keys + ["_salt"], how).drop("_salt")
