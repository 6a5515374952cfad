"""Testdata-drift guards for the raw readers (VERDICT r3 item 1).

The driver regenerates /root/testdata between rounds and the physical
encoding of events.ts has already drifted once (TIMESTAMP(NANOS)-as-long
-> timestamp[us]-as-NTZ), crashing a whole bench round.  Pin the reader
contract: whatever the file stores, ``read_events`` (and therefore the
streaming twin, which shares ``normalize_events_ts``) must surface a
proper TimestampType with sane values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import (
    normalize_events_ts,
    read_events,
)

from .conftest import SF_SMOKE


def test_read_events_ts_is_timestamp(spark):
    df = read_events(spark, SF_SMOKE)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    # sane epoch range: not 1970 (the nanos-misread failure mode), not far future
    assert lo.year >= 2000 and hi.year <= 2100


def test_normalize_events_ts_bigint_nanos(spark):
    # legacy encoding: nanosecond longs (spark.sql.legacy.parquet.nanosAsLong)
    nanos = 1_600_000_000 * 1_000_000_000
    df = spark.createDataFrame([(nanos,)], "ts long")
    out = normalize_events_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    assert out.first().ts.year == 2020


def test_normalize_events_ts_rejects_unknown(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported dtype"):
        normalize_events_ts(df)


def test_pysource_split_slicing_covers_exactly_once():
    """The reader's input splits must tile [0, rows) exactly — no gaps,
    no overlaps — for adversarial rows/splits combinations."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.pysource import (
        SyntheticEventsReader,
    )

    for rows, splits in [(0, 8), (1, 8), (7, 8), (8, 8), (9, 8), (20000, 8), (5, 1)]:
        r = SyntheticEventsReader({"rows": str(rows), "partitions": str(splits)})
        seen = []
        for p in r.partitions():
            seen.extend(range(p.start, p.end))
        assert seen == list(range(rows)), (rows, splits)


def test_pysource_rows_are_pure_functions_of_id():
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.pysource import (
        row_for,
    )

    assert row_for(0) == (0, 0, "view", 0.0)
    assert row_for(5) == (5, 655, "cart", 1.85)
    # retry idempotence: same id, same row
    assert row_for(123456) == row_for(123456)
