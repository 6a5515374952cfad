"""Catalog-wide plan-build smoke (VERDICT r3 item 6): every catalog
entry must ANALYZE cleanly at sf0.001 — ``fn(spark, sf)`` plus a
``.schema`` touch, no execution of the result.

Round 3 shipped a bench that crashed at plan-build time
(`events_sessionize` threw DATATYPE_MISMATCH after the testdata's
physical ts encoding drifted); this would have caught it in
milliseconds.  Any future testdata drift that breaks analysis — a
renamed column, a re-typed field, a lost table — goes red here before
the oracle suite or the bench ever run.
"""

from __future__ import annotations

import pytest

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog

from .conftest import SF_SMOKE

CATALOG = get_catalog()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_entry_builds(spark, name):
    df = CATALOG[name].fn(spark, SF_SMOKE)
    assert df.schema.fields, f"{name} produced an empty schema"
