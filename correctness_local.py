"""Full-catalog correctness artifact: runs EVERY catalog entry on Spark
AND its DuckDB oracle at sf0.01 and writes ``CORRECTNESS_LOCAL.json`` in
the driver's CORRECTNESS_r{N}.json format (rows/schema/hash verdicts).

The driver samples ~50 of the catalog per round; this artifact carries
the machine-readable verdict for the rest (VERDICT r4 "What's missing"
#1 / "Next round" #3). Refresh as part of the round's verify sweep:

    python correctness_local.py            # sf0.01, all entries
    SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1 python correctness_local.py

Comparison semantics are IDENTICAL to tests/conftest.py's
assert_matches_oracle (column-name-sorted, order-insensitive multiset of
normalized cell tokens) — the same gate pytest enforces; this script
just emits the per-entry result as JSON instead of asserting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.session import get_spark
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.sources.tpch import TABLES
from tests.conftest import rows_to_multiset

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    os.environ.get("SPARK_GRAFT_CORR_OUT", "CORRECTNESS_LOCAL.json"),
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    spark = get_spark(app_name="ecdw-correctness-local", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    catalog = get_catalog()
    # optional name filter for fast iteration: any argv names (or substring
    # with a trailing *) restrict the sweep AND suppress the artifact write
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        names = [
            n for n in catalog
            if any(n == o or (o.endswith("*") and n.startswith(o[:-1])) for o in only)
        ]
        catalog = {n: catalog[n] for n in names}
    results: dict[str, dict] = {}
    t_start = time.perf_counter()
    for name in sorted(catalog):
        q = catalog[name]
        rec: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            df = q.fn(spark, sf_dir)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(sp_rows)
            if q.oracle is None:
                # rows-only check (non-SQL-expressible op): stable re-run
                n2 = len(q.fn(spark, sf_dir).take(len(sp_rows) + 1))
                rec.update(
                    rows_match=(n2 == len(sp_rows)), schema_match=True,
                    hash_match=None, oracle_rows=None, rows_only=True,
                )
            else:
                res = con.execute(q.oracle)
                du_cols = [d[0] for d in res.description]
                du_rows = res.fetchall()
                rec["oracle_rows"] = len(du_rows)
                rec["rows_match"] = len(sp_rows) == len(du_rows)
                rec["schema_match"] = sorted(sp_cols) == sorted(du_cols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rows_to_multiset(sp_cols, sp_rows)
                    == rows_to_multiset(du_cols, du_rows)
                )
        except Exception as e:  # noqa: BLE001 - artifact records, never dies
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        ok = rec["err"] is None and rec["rows_match"] and rec["schema_match"] and (
            rec["hash_match"] is not False
        )
        print(f"  {'ok ' if ok else 'BAD'} {name}: spark={rec['spark_rows']}"
              f" oracle={rec['oracle_rows']}", flush=True)

    n_bad = sum(
        1 for r in results.values()
        if r["err"] is not None or not r["rows_match"] or not r["schema_match"]
        or r["hash_match"] is False
    )
    # completeness: a full sweep must cover the ENTIRE catalog — a stale
    # artifact (entries < catalog) is a failure even with zero bad rows
    # (VERDICT r7 "What's wrong" #1)
    n_catalog = len(get_catalog())
    incomplete = not only and len(results) != n_catalog
    summary = {
        "sf_dir": sf_dir,
        "entries": len(results),
        "catalog": n_catalog,
        "bad": n_bad,
        "rows_only": sum(1 for r in results.values() if r.get("rows_only")),
        "elapsed_sec": round(time.perf_counter() - t_start, 1),
    }
    if not only:  # partial sweeps never clobber the full artifact
        with open(OUT, "w") as f:
            json.dump({"_summary": summary, **results}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    sys.exit(1 if (n_bad or incomplete) else 0)


if __name__ == "__main__":
    main()
