"""Statistical-analytics entries (plans/stats_queries.py): the ntile /
percent_rank / cume_dist closed forms used by ``window_customer_deciles``
must be bit-identical to Spark's own window functions for ANY frame size —
including the adversarial n % k boundaries the sf-pinned oracle run can't
sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.ranking import (
    ordered_prefix_sum,
)

K = 10


def _closed_form(df_ranked, n: int):
    """The map-side (rank, n) -> (ntile, pct_rank, cume) arithmetic from
    plans/stats_queries.py::window_customer_deciles, k=10."""
    rn = F.col("rn")
    q, rem = n // K, n % K
    big = q + 1
    decile = F.when(rn <= rem * big, ((rn - 1) / big).cast("long") + 1)
    if q > 0:  # when n < k the big-bucket branch covers every row
        decile = decile.otherwise(rem + ((rn - rem * big - 1) / q).cast("long") + 1)
    return df_ranked.select(
        "id",
        decile.cast("int").alias("decile"),
        ((rn - 1).cast("double") / (n - 1)).alias("pct_rank"),
        (rn.cast("double") / n).alias("cume"),
    )


# sizes straddling every n%k case: n<k, n==k, n%k==0, n%k==1, n%k==k-1, big
@pytest.mark.parametrize("n", [3, 10, 40, 41, 49, 257])
def test_ntile_closed_form_matches_engine_window(spark, n):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    ranked = ordered_prefix_sum(
        df.withColumn("_one", F.lit(1)),
        [("v", "desc"), ("id", "asc")],
        "_one",
        out="rn",
    ).drop("_one")
    got = _closed_form(ranked, n)

    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.select(
        "id",
        F.ntile(K).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_pca_top2_orthogonal_and_ordered(spark):
    """Deflation sanity: the two loadings are (near-)orthogonal unit
    vectors and the first component explains at least as much variance
    as the second."""
    from .conftest import SF_SMOKE
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.llm_ops import (
        pca_top2_deflation,
    )

    rows = pca_top2_deflation(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    dot = sum(r["loading1"] * r["loading2"] for r in rows)
    n1 = sum(r["loading1"] ** 2 for r in rows)
    n2 = sum(r["loading2"] ** 2 for r in rows)
    assert abs(dot) < 1e-3, f"components not orthogonal: {dot}"
    assert abs(n1 - 1) < 1e-3 and abs(n2 - 1) < 1e-3
    assert rows[0]["ratio1"] >= rows[0]["ratio2"] > 0
