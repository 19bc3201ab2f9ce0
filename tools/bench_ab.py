"""Controlled A/B of the bench measurement policies (round-9 verdict
task 2): the round-9 harness added a discarded per-plan warm-up run and
up-to-two spike re-runs, and the same round's common-query total
drifted +3.1% — this script separates methodology from interference by
computing BOTH policies from the SAME run sequence.

For each query: 8 timed executions in one quiet session, then
  r8 policy  = median of runs 1-3 (no warm-up discard, no spike logic)
  r9 policy  = runs 2-4 after the discarded run 1, with the spike
               window applied against the remaining runs (replacement
               runs drawn from runs 5+ instead of fresh executions)
  steady     = median of runs 4-8 (post-warm-up truth)

Because both policies read one sequence, any difference between them
is METHODOLOGY by construction; the difference between either and the
recorded BENCH_r08/r09 values is box/interference drift.

Usage: python tools/bench_ab.py [n_queries] — writes BENCH_AB.json.
Run alone (never concurrently with pytest or another Spark job).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Biggest r8->r9 positive movers plus the flagged growth_accounting and
# a spread of stable queries — the set the drift adjudication needs.
QUERIES = [
    "jaccard_join", "repetition_stats", "dsir_weights", "label_noise",
    "dedup_clusters", "debounced_events", "containment_pairs",
    "tfidf_terms", "kmeans_cluster_profile", "hybrid_search",
    "quantiles_exact", "curation_pipeline", "semantic_dedup",
    "contamination_check", "bm25_search", "growth_accounting",
    "revenue_by_nation", "pricing_summary", "top_orders", "substring_dedup",
]

N_RUNS = 8
SPIKE_THRESHOLD = 1.9


def _median3(xs):
    return sorted(xs)[1]


def main() -> None:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else len(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.session import create_spark_session

    spark = create_spark_session(
        "bench-ab", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    _w = F.pandas_udf(lambda x: x, "long")
    spark.range(0, 64, 1, 8).select(_w(F.col("id"))).write.format("noop").mode("overwrite").save()
    spark.range(64).localCheckpoint(eager=True).write.format("noop").mode("overwrite").save()

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    out: dict[str, dict] = {}
    for name in QUERIES[:n_q]:
        fn = qs[name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        r8_est = _median3(runs[0:3])
        # r9 policy replay: discard run 1; window = runs 2-4; spike
        # replacements come from runs 5+ (same box, same session)
        window = runs[1:4]
        pool = runs[4:]
        retries = 0
        while (
            max(window) / min(window) >= SPIKE_THRESHOLD
            and retries < 2
            and pool
        ):
            window.remove(max(window))
            window.append(pool.pop(0))
            retries += 1
        r9_est = _median3(window)
        steady = statistics.median(runs[3:])
        out[name] = {
            "runs": [round(r, 3) for r in runs],
            "r8_policy": round(r8_est, 3),
            "r9_policy": round(r9_est, 3),
            "steady_median": round(steady, 3),
            "spike_retries": retries,
        }
        print(
            f"{name}: r8={r8_est:.2f} r9={r9_est:.2f} steady={steady:.2f}",
            flush=True,
        )

    totals = {
        k: round(sum(v[k] for v in out.values()), 2)
        for k in ("r8_policy", "r9_policy", "steady_median")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_AB.json"), "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "n_runs": N_RUNS, "totals": totals,
             "queries": out},
            fh, indent=1,
        )
        fh.write("\n")
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
