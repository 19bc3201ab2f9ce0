"""Per-query profiler for the optimization rounds (guide §1).

For each named query (default: the N slowest from BENCH_DETAIL.json):

* times CONSTRUCTION (the ``fn(spark, sf_dir)`` call — driver-side plan
  building plus any eager actions like localCheckpoint/collect) and the
  noop WRITE separately, over N runs after a discarded warmup;
* counts Spark JOBS, STAGES and TASKS the query triggers per run and
  sums executor task runtime (from the JVM AppStatusStore), so
  scheduling overhead vs compute is visible without the UI;
* optionally dumps ``.explain("formatted")`` to plans/r12/<q>_<tag>.txt.

Usage:
  python tools/profile_query.py q1,q2 [--runs 3] [--plans TAG]
  python tools/profile_query.py --top 15
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _store_totals(spark):
    """(n_jobs, n_stages, n_tasks, task_time_ms) from AppStatusStore."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n_jobs = jobs.size()
    n_stages = 0
    n_tasks = 0
    task_ms = 0
    gw = sc._gateway
    empty = sc._jvm.java.util.ArrayList()
    empty2 = sc._jvm.java.util.ArrayList()
    no_quantiles = gw.new_array(gw.jvm.double, 0)
    slist = store.stageList(empty, False, False, no_quantiles, empty2)
    for i in range(slist.size()):
        s = slist.apply(i)
        n_stages += 1
        n_tasks += s.numCompleteTasks()
        task_ms += s.executorRunTime()
    return n_jobs, n_stages, n_tasks, task_ms


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    args = sys.argv[1:]
    runs = 3
    plans_tag = None
    names: list[str] = []
    top = 0
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif a == "--top":
            top = int(args[i + 1]); i += 2
        else:
            names.extend(n for n in a.split(",") if n)
            i += 1

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.session import create_spark_session

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    if top:
        detail = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json")))
        names = [k for k, _ in sorted(
            detail["queries"].items(), key=lambda kv: -kv[1])[:top]]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = create_spark_session(
        "profile-query", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    # same warmups as bench.py
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    _wu = F.pandas_udf(lambda x: x, "long")
    spark.range(0, 64, 1, int(cpus)).select(_wu(F.col("id"))).write.format("noop").mode("overwrite").save()
    _wa = F.pandas_udf(lambda x: x.map(lambda v: [v]), "array<long>")
    spark.range(0, 64, 1, int(cpus)).select(_wa(F.col("id"))).write.format("noop").mode("overwrite").save()
    spark.range(64).localCheckpoint(eager=True).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warmup run (per-plan codegen)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cons, writes, jobs, stages, tasks, task_ms = [], [], [], [], [], []
        for _ in range(runs):
            j0, s0, t0n, m0 = _store_totals(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j1, s1, t1n, m1 = _store_totals(spark)
            cons.append(t1 - t0)
            writes.append(t2 - t1)
            jobs.append(j1 - j0)
            stages.append(s1 - s0)
            tasks.append(t1n - t0n)
            task_ms.append(m1 - m0)
        if plans_tag:
            pdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
            )
            os.makedirs(pdir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(pdir, f"{name}_{plans_tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        cons.sort(); writes.sort()
        rec = {
            "construct_s": round(cons[len(cons) // 2], 3),
            "write_s": round(writes[len(writes) // 2], 3),
            "total_s": round(cons[len(cons) // 2] + writes[len(writes) // 2], 3),
            "jobs": jobs[-1],
            "stages": stages[-1],
            "tasks": tasks[-1],
            "task_time_s": round(task_ms[-1] / 1000.0, 2),
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
