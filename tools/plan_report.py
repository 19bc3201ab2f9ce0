"""Physical-plan audit: compile EVERY registered query (declared +
extra) at the given SF and emit a per-query summary of the plan
features that matter at 100 TB — exchanges (shuffles), parquet scans,
broadcast vs shuffle joins, whole-stage-codegen spans, Arrow vs
row-wise Python, windows, sorts.

Output: PLAN_AUDIT.json next to this repo's bench artifacts —
{"queries": {name: {...counts}}, "totals": {...}}. Plans are compiled
only; nothing executes except queries whose CONSTRUCTION runs driver
steps by design (iterative trainers).

Caveat: under AQE the compiled (pre-execution) plan is the INITIAL
plan — whole-stage-codegen region markers mostly materialize in the
runtime final plan, so ``codegen_spans`` underreports and is
indicative only; the join/exchange/Python counts are exact.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning")
        + plan.count("Exchange SinglePartition"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "parquet_scans": len(re.findall(r"Scan parquet", plan)),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "shuffle_hash_joins": plan.count("ShuffledHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        # executedPlan.toString renders whole-stage-codegen regions as
        # "*(n) Operator" markers; count distinct region ids.
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "arrow_python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("FlatMapCoGroupsInPandas")
        + plan.count("MapInArrow"),
        "rowwise_python": plan.count("BatchEvalPython"),
        "windows": plan.count("Window "),
        "sorts": plan.count("Sort "),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.session import create_spark_session

    spark = create_spark_session(
        "plan-audit", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    out, totals = {}, {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit robustness
            out[name] = {"error": str(e)[:200]}
            continue
        s = summarize(plan)
        out[name] = s
        for k, v in s.items():
            totals[k] = totals.get(k, 0) + v
    report = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "totals": totals,
        "queries": out,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_AUDIT.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"n_queries": len(out), "totals": totals}))
    errs = [n for n, s in out.items() if "error" in s]
    rowwise = [n for n, s in out.items() if s.get("rowwise_python")]
    cart = [n for n, s in out.items() if s.get("cartesian_products")]
    if errs:
        print("ERRORS:", errs)
    if rowwise:
        print("ROW-WISE PYTHON:", rowwise)
    if cart:
        print("CARTESIAN:", cart)
    return 1 if errs or rowwise or cart else 0


if __name__ == "__main__":
    raise SystemExit(main())
