"""Physical-plan audit: compile EVERY registered query (declared +
extra) at the given SF and emit a per-query summary of the plan
features that matter at 100 TB — exchanges (shuffles), parquet scans,
broadcast vs shuffle joins, whole-stage-codegen spans, Arrow vs
row-wise Python, windows, sorts.

Round 11: the audit sees THROUGH lineage cuts. Every query is built
under ``rdsa_utils_spark.plans.audit.capture_lineage_cuts``, which
records the physical plan of every frame materialized during
construction (``localCheckpoint`` / ``collect`` / ``toPandas`` /
``count`` / ``isEmpty``) BEFORE the cut replaces it with a ``Scan
ExistingRDD`` leaf. A query's counts are the SUM over its final plan
plus the CUT-producing (checkpoint) segments, so a checkpointed
composition like curation_e2e reports its real parquet scans and its
real window operators instead of a bare RDD scan; probe-kind segments
(collect/count/toPandas/isEmpty), whose lineage may also feed the
final lazy plan, are reported separately under ``probe_counts`` as an
upper bound (summing them into the main counts would double-count
overlapping lineages — ADVICE r11). Extra keys:

* ``global_windows`` — STRUCTURAL count of window operators with an
  empty partitionSpec (single-partition at runtime), final + segments;
* ``plan_segments`` / ``literal_frames`` — captured cut plans and
  driver-literal createDataFrame markers;
* ``unbacked_rdd_sources`` — RDD-backed createDataFrame calls, which
  WOULD hide lineage (must stay 0; tests/test_plan_hygiene.py refuses);
* ``rdd_scans`` — Scan ExistingRDD leaves across final + segments,
  each backed by a captured segment or literal marker.

Output: PLAN_AUDIT.json next to this repo's bench artifacts —
{"queries": {name: {...counts}}, "totals": {...}}. Construction-time
driver steps (iterative trainers) execute as they always did; the
final frames are compiled only.

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
        "rdd_scans": plan.count("Scan ExistingRDD"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.plans.audit import audit_query
    from rdsa_utils_spark.session import create_spark_session

    spark = create_spark_session(
        "plan-audit", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    out, totals = {}, {}
    for name, fn in sorted(qs.items()):
        try:
            rec = audit_query(fn, spark, sf_dir)
        except Exception as e:  # pragma: no cover - audit robustness
            out[name] = {"error": str(e)[:200]}
            continue
        s = summarize(rec["final"]["plan"])
        # Only CUT-producing segments (checkpoint) sum into the main
        # counts — their operators are genuinely replaced by an RDD
        # leaf in the final plan. Probe kinds (collect/count/toPandas/
        # isEmpty) often materialize a frame that ALSO feeds the final
        # lazy plan, so summing them would double-count scans and
        # exchanges for overlapping lineages (ADVICE r11); they are
        # reported separately under ``probe_counts`` as an UPPER bound
        # over possibly-overlapping lineage.
        cut_plans = [
            g["plan"] for g in rec["segments"]
            if g.get("plan") and g["kind"] == "checkpoint"
        ]
        probe_plans = [
            g["plan"] for g in rec["segments"]
            if g.get("plan") and g["kind"] != "checkpoint"
        ]
        for p in cut_plans:
            for k, v in summarize(p).items():
                s[k] += v
        probe: dict = {}
        for p in probe_plans:
            for k, v in summarize(p).items():
                probe[k] = probe.get(k, 0) + v
        # global_windows stays the FULL final+segments sum — identical
        # to the tests/test_plan_hygiene.py gate (over-counting is the
        # conservative direction for a window-hygiene gate).
        s["global_windows"] = rec["final"]["global_windows"] + sum(
            g.get("global_windows", 0) for g in rec["segments"]
        )
        s["plan_segments"] = len(cut_plans) + len(probe_plans)
        s["probe_segments"] = len(probe_plans)
        s["literal_frames"] = sum(
            1 for g in rec["segments"] if g["kind"] == "literal_createDataFrame"
        )
        s["unbacked_rdd_sources"] = sum(
            1 for g in rec["segments"] if g.get("unbacked")
        )
        for k, v in s.items():
            totals[k] = totals.get(k, 0) + v
        if probe:
            s["probe_counts"] = probe
        out[name] = s
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
    unbacked = [n for n, s in out.items() if s.get("unbacked_rdd_sources")]
    gw = {n: s["global_windows"] for n, s in out.items() if s.get("global_windows")}
    if errs:
        print("ERRORS:", errs)
    if rowwise:
        print("ROW-WISE PYTHON:", rowwise)
    if cart:
        print("CARTESIAN:", cart)
    if unbacked:
        print("UNBACKED RDD SOURCES:", unbacked)
    if gw:
        print("GLOBAL WINDOWS:", json.dumps(gw))
    return 1 if errs or rowwise or cart or unbacked else 0


if __name__ == "__main__":
    raise SystemExit(main())
