"""The main correctness gate, mirrored locally: every catalog entry with
an oracle runs on Spark AND DuckDB at sf0.01 and must match on column
names, row count, and an order-insensitive value multiset — the same
comparison the driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog

from .conftest import SF_ORACLE, assert_matches_oracle

CATALOG = get_catalog()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, oracle, name):
    q = CATALOG[name]
    df = q.fn(spark, SF_ORACLE)
    if q.oracle is None:
        # rows-only check (non-SQL-expressible op): must run and be stable
        n1 = df.count()
        n2 = q.fn(spark, SF_ORACLE).count()
        assert n1 == n2
        return
    assert_matches_oracle(df, oracle, q.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(CATALOG)
