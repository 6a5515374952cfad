"""CDC change-feed application — MERGE (upsert + delete) semantics over
a snapshot and an out-of-order feed of full-row change images, the
generalization of the reference's ON CONFLICT upsert (ETL.sql:304-315)
that a continuously-ingesting warehouse actually runs.

Contract: ``feed`` rows are FULL images (Debezium-style after-images) —
an update carries the whole new payload, never a partial patch. Under
that contract the final state of any key depends ONLY on its
sequence-maximal change (inserts/updates re-image the row, deletes
tombstone it), so the distributed apply needs no replay: one
latest-wins window over the feed plus one full-outer join against the
snapshot, both on the key — two co-partitioned shuffles total,
regardless of how many changes a hot key accumulated or how shuffled
their arrival order was. ``tests/test_drift_properties.py`` proves the
equivalence against a serial op-by-op replay on randomized feeds.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import latest_wins


def apply_change_feed(
    base: DataFrame,
    feed: DataFrame,
    key: str | Sequence[str],
    payload: Sequence[str],
    order_col: str,
    tiebreak: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply ``feed`` (columns: key, op ∈ {'I','U','D'}, *payload,
    order_col, tiebreak) to ``base`` (columns: key, *payload).

    ``key`` may be one column name or a composite-key list (a MERGE
    whose ON is an AND of equalities); all joins/windows then run on
    the full key tuple. Returns the post-apply snapshot: key, *payload,
    and ``src`` ∈
    {'base', 'insert', 'update'} — tombstoned keys are absent. The
    (order_col, tiebreak) pair must make the per-key sequence strict;
    ordering is by EVENT sequence, not arrival, so late/re-delivered
    changes land identically (retry-idempotent). An explicit base
    marker (not a payload null-probe) detects inserts, so NULL payload
    values stay legal on both sides.
    """
    keys = [key] if isinstance(key, str) else list(key)
    latest = latest_wins(
        feed.select(*keys, op_col, *payload, order_col, tiebreak),
        keys,
        order_col,
        tiebreak,
    ).select(
        *keys, op_col, *[F.col(c).alias(f"_f_{c}") for c in payload]
    )
    marked = base.withColumn("_in_base", F.lit(True))
    applied = marked.join(latest, keys, "full_outer")
    return (
        applied.filter(F.coalesce(F.col(op_col), F.lit("")) != "D")
        .select(
            *keys,
            *[
                F.when(
                    F.col(op_col).isin("I", "U"), F.col(f"_f_{c}")
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
            F.when(F.col(op_col).isNull(), "base")
            .when(F.col("_in_base").isNull(), "insert")
            .otherwise("update")
            .alias("src"),
        )
    )
