"""Machine-generated physical-plan audit for every catalog entry.

Writes ``PLAN_AUDIT.json`` (+ a compact ``PLAN_AUDIT.md`` table): per
entry, the shuffle/broadcast/window/Python-boundary/codegen profile of
the ANALYZED physical plan at sf0.001 — the per-entry evidence behind
the scale claims in SURVEY.md §2.11 (the pass/fail version of this scan
is enforced by tests/test_catalog_buildable.py; this artifact records
the raw counts so a reviewer can rank entries by plan weight without
rebuilding them).

Columns:
  hash_ex / range_ex / single_ex  — Exchange hashpartitioning / range /
                                    SinglePartition counts
  bcast                           — BroadcastExchange count
  windows                         — WindowExec count
  py                              — Python-boundary operators
                                    (ArrowEvalPython / MapInPandas /
                                    FlatMapGroupsInPandas / ...)
  cartesian                       — CartesianProduct count (expected 0
                                    outside the forced join study)

Usage: python plan_audit.py   (optional: entry names as argv filter)
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans import get_catalog
from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")
HERE = os.path.dirname(os.path.abspath(__file__))

_PATTERNS = {
    "hash_ex": re.compile(r"Exchange hashpartitioning"),
    "range_ex": re.compile(r"Exchange rangepartitioning"),
    "single_ex": re.compile(r"Exchange SinglePartition"),
    "bcast": re.compile(r"BroadcastExchange"),
    "windows": re.compile(r"\bWindow(?:Exec|\b)"),
    "py": re.compile(
        r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython|PythonMapInArrow"
    ),
    "cartesian": re.compile(r"CartesianProduct"),
}


#: an ungrouped aggregate directly under the exchange: its exchange
#: carries one partial row per upstream partition, not the data
#: (same rule as tests/test_catalog_buildable.py, applied here to
#: EXECUTED plan text so AQE demotions can't hide behind the
#: analyzed-plan guard).
_SCALAR_AGG = re.compile(r"(Hash|Sort|ObjectHash)?Aggregate\(keys?=\[\]")


def _node_offset(line: str) -> int:
    """Column where the node NAME starts, past the tree art."""
    return len(line) - len(line.lstrip(" :+-"))


def _child_node(lines: list[str], i: int) -> str:
    """The tree child of ``lines[i]`` by indentation depth (+3 cols),
    never literal adjacency (AQE wrappers / multi-child siblings)."""
    off = _node_offset(lines[i])
    for nxt in lines[i + 1:]:
        if not nxt.strip() or nxt.startswith("="):
            break
        noff = _node_offset(nxt)
        if noff == off + 3:
            return nxt
        if noff <= off:
            break
    return ""


def nonscalar_single_ex(plan: str) -> int:
    """Count SinglePartition exchanges whose child is NOT a scalar
    (ungrouped) aggregate — i.e. funnels that pull DATA through one
    partition. ReusedExchange lines are skipped: they only NAME their
    target, which is counted where it is defined."""
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln or "ReusedExchange" in ln:
            continue
        if not _SCALAR_AGG.search(_child_node(lines, i)):
            n += 1
    return n


def main() -> None:
    spark = get_spark(app_name="ecdw-plan-audit", shuffle_partitions=8)
    catalog = get_catalog()
    only = set(sys.argv[1:])
    rows: dict[str, dict] = {}
    for name in sorted(catalog):
        if only and name not in only:
            continue
        try:
            df = catalog[name].fn(spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="simple")
            plan = buf.getvalue()
            rows[name] = {k: len(p.findall(plan)) for k, p in _PATTERNS.items()}
        except Exception as e:  # noqa: BLE001 — audit records, never dies
            rows[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        print(name, rows[name], flush=True)

    if not only:
        from harness_util import git_head

        with open(os.path.join(HERE, "PLAN_AUDIT.json"), "w") as f:
            json.dump({"_meta": {"git_head": git_head()}, **rows},
                      f, indent=1, sort_keys=True)
        # merge the EXECUTED-plan audit (final AQE plans at the bench
        # scale, emitted by bench.py) as a trailing column for the
        # headline entries it covers
        exec_path = os.path.join(HERE, "PLAN_AUDIT_EXEC.json")
        exec_rows: dict[str, dict] = {}
        exec_sf = ""
        if os.path.exists(exec_path):
            with open(exec_path) as f:
                ex = json.load(f)
            exec_rows = ex.get("entries", {})
            exec_sf = ex.get("sf_dir", "")
        cols = list(_PATTERNS)
        lines = [
            "# PLAN_AUDIT — physical-plan profile per catalog entry",
            "",
            f"Generated by plan_audit.py at {SF} (analyzed plans; the "
            "`executed` column carries the FINAL adaptive plan profile "
            f"from the bench run at {exec_sf or 'n/a'} for headline "
            "entries — AQE shuffle reads / skew joins / codegen spans, "
            "via bench.py → PLAN_AUDIT_EXEC.json).",
            "See module docstring for column meanings.",
            "",
            "| entry | " + " | ".join(cols) + " | executed@bench |",
            "|---|" + "---|" * (len(cols) + 1),
        ]
        for name, r in sorted(rows.items()):
            er = exec_rows.get(name)
            if er is None:
                ecell = ""
            elif "err" in er:
                ecell = f"ERR: {er['err'][:60]}"
            else:
                ecell = (
                    f"aqe_reads={er.get('aqe_shuffle_reads', 0)} "
                    f"skew={er.get('skew_joins', 0)} "
                    f"codegen={er.get('codegen_spans', 0)} "
                    f"final={'y' if er.get('aqe_final') else 'n'}"
                )
            if "err" in r:
                # pad to the header width (len(cols) pattern cells +
                # executed) so an error never emits a malformed row
                pad = " | ".join([""] * (len(cols) - 1))
                lines.append(f"| {name} | ERR: {r['err']} | {pad} | {ecell} |")
            else:
                lines.append(
                    f"| {name} | " + " | ".join(str(r[c]) for c in cols)
                    + f" | {ecell} |"
                )
        with open(os.path.join(HERE, "PLAN_AUDIT.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
