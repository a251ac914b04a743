"""Plan-quality report over every queries() entry.

For each query, analyzes (does not execute, except auto-probes inside
query builders) the physical plan and reports the scale-relevant
properties the engine claims: scan pushdown, broadcast joins, codegen
fusion, Python boundaries, and collect smells. Run:

    python tools/plan_report.py [sf_dir] [query ...]

Output: one markdown table row per query — drop into a round report or
diff between rounds to catch silent plan regressions beyond what
tests/test_plan_shapes.py pins.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from projet_big_data_boutin_danre_spark.session import get_spark  # noqa: E402


def plan_props(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    codegen_ids = [int(m) for m in re.findall(r"\*\((\d+)\)", plan)]
    return {
        "scans": plan.count("FileScan parquet"),
        "pushed": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        "bcast": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "exch": plan.count("Exchange"),
        "codegen": max(codegen_ids) if codegen_ids else 0,
        "python": sum(
            plan.count(t)
            for t in (
                "MapInPandas",
                "FlatMapCoGroupsInPandas",
                "FlatMapGroupsInPandas",
                "ArrowEvalPython",
                "BatchEvalPython",
            )
        ),
        "rowudf": plan.count("BatchEvalPython"),  # row-at-a-time: must be 0
        "nested_loop": plan.count("NestedLoop") + plan.count("CartesianProduct"),
        "topk": "TakeOrderedAndProject" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan_report")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    print(
        "| query | scans | pushed | bcast | smj | exch | codegen | "
        "python | rowUDF | nestedloop | topk |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    bad = []
    for name in names:
        try:
            p = plan_props(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - report, don't die
            print(f"| {name} | ERROR: {type(e).__name__}: {e} |")
            bad.append(name)
            continue
        if p["rowudf"] or p["nested_loop"]:
            bad.append(name)
        print(
            f"| {name} | {p['scans']} | {'y' if p['pushed'] else '-'} | "
            f"{p['bcast']} | {p['smj']} | {p['exch']} | {p['codegen']} | "
            f"{p['python']} | {p['rowudf']} | {p['nested_loop']} | "
            f"{'y' if p['topk'] else '-'} |"
        )
    print()
    if bad:
        print(f"FLAGGED (row-UDF / nested-loop / error): {sorted(bad)}")
        sys.exit(1)
    print(f"OK: {len(names)} plans, zero row-at-a-time UDFs, zero nested loops")


if __name__ == "__main__":
    main()
