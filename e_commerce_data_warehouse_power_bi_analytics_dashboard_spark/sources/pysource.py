"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
partition-parallel deterministic event generator.

The reference's source surface is files + JDBC; this adds the remaining
connector family — a PROGRAMMATIC source registered with
``spark.dataSource.register`` and read via ``spark.read.format(name)``,
the extension point you'd use for a real external system (a REST API, a
message queue, a proprietary store) when no built-in connector exists.

Scale design: generation is split across ``partitions`` input splits;
each executor materializes ONLY its half-open id slice (the same
contract as Spark's built-in ``range``), so the source parallelizes and
never funnels through the driver.  Rows are a pure function of the row
id, which makes the source (a) retry-idempotent — a re-read of a failed
split reproduces identical rows, the property a restartable pipeline
needs from any source — and (b) oracle-checkable: the DuckDB twin
regenerates the same rows from ``range()`` arithmetic.

All values are exact-integer-derived (value = cents/100 surfaces an
exact 2-decimal double), keeping the catalog's cross-engine hashing
discipline.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: event-type ring, indexed by id % 4 (same order in the SQL oracle)
ETYPES = ("view", "cart", "purchase", "refund")

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("ecdw_synthetic_events")`` with options
    ``rows`` (total row count) and ``partitions`` (input splits)."""

    @classmethod
    def name(cls) -> str:
        return "ecdw_synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def row_for(i: int) -> tuple[int, int, str, float]:
    """The one generation formula, shared by every split (and mirrored in
    the oracle SQL): user from a multiplicative hash, type from the ring,
    value an exact 2-decimal amount."""
    return (i, (i * 131) % 997, ETYPES[i % 4], ((i * 37) % 10000) / 100.0)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.splits = max(1, int(options.get("partitions", "8")))
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")

    def partitions(self):
        if self.rows == 0:
            return [_Slice(0, 0)]
        per = -(-self.rows // self.splits)  # ceil
        return [
            _Slice(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield row_for(i)
