"""Adversarial HIGH-DUPLICATION scale probe for the substring/span
dedup family (VERDICT r10 task 5).

The standard scale probe replicates the TPC-H-ish corpus, whose text
is low-duplication — it under-stresses the ONE data-dependent term in
``substring_dedup``/``span_dedup`` that grows with dirty real-world
corpora: the duplicate-coverage explode (rows proportional to
duplicated volume). This probe builds corpora with EXACTLY ~50 %
duplicated volume and measures the scaling tail on them.

Corpus construction (``.scale/dup{X}/documents.parquet``):
- the CLEAN half replicates sf0.1 documents with a replica marker
  token woven in every 8 words, which breaks every ≥8-token shingle
  run across replicas (cross-replica duplication ≈ 0 at n=8 — unlike
  the standard .scale replication, whose single prefix token leaves
  replicas ~fully substring-duplicated);
- the DUP half is a re-keyed verbatim copy of the clean half — every
  byte of it is duplicated volume with FULL-LENGTH duplicated spans,
  the worst case for span-coverage explode.

Output: SCALE_PROBE_ADVERSARIAL.json — same entry shape as
SCALE_PROBE.json (seconds_by_sf / fit_exponent / tail_exponent), kept
as a separate artifact because tools/scale_probe.py rewrites
SCALE_PROBE.json from scratch and tests/test_artifact_freshness.py
pins that file's queries to the registry.

Run alone (host noise). Usage:
  python tools/dup_stress_probe.py [runs_per_point] [query ...]
Defaults: 2 runs; substring_dedup span_dedup.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
#: replication factors → effective sf (relative to the 0.1 base);
#: each factor's corpus is half clean replicas, half verbatim copy.
FACTORS = [1, 2, 5, 10, 20]


def _build(spark, k: int, out: str) -> None:
    from pyspark.sql import functions as F

    from rdsa_utils_spark.sources.readers import read_parquet

    base = read_parquet(spark, f"{SRC}/documents.parquet")
    pieces = []
    for i in range(k):
        rep = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000))
        if i > 0:
            # weave a replica marker into every 8th token: kills every
            # 8-token shingle shared with other replicas while keeping
            # realistic text statistics
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t, j: F.when(
                            j % 8 == 0, F.concat(F.lit(f"u{i}x"), t),
                        ).otherwise(t),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text"))
        pieces.append(rep)
    clean = pieces[0]
    for p in pieces[1:]:
        clean = clean.unionByName(p)
    dup = clean.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10_000))
    corpus = clean.unionByName(dup)
    corpus.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet",
    )


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or ["substring_dedup", "span_dedup"]

    os.environ.setdefault("SPARK_LOCAL_DRIVER_MEM", "48g")

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.session import create_spark_session

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    spark = create_spark_session(
        "dup-stress-probe", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite",
    ).save()

    points = []
    for k in FACTORS:
        out = os.path.join(repo, ".scale", f"dup{k}")
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            print(f"building {out} (k={k}, 50% duplicated volume)", flush=True)
            _build(spark, k, out)
        points.append((out, 0.1 * k))

    results: dict[str, dict] = {}
    for qname in names:
        fn = qs[qname]
        series = {}
        for sf_dir, sf in points:
            best = None
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            series[str(round(sf, 2))] = round(best, 3)
            print(f"{qname} @ dup-sf{sf:g}: {best:.2f}s", flush=True)
        xs = [math.log(float(s)) for s in series]
        ys = [math.log(max(v, 1e-3)) for v in series.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        slope = (
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
            if denom else 0.0
        )
        svals = sorted(((float(s), v) for s, v in series.items()))
        (s0, t0_), (s1, t1_) = svals[-2], svals[-1]
        tail = math.log(t1_ / max(t0_, 1e-3)) / math.log(s1 / s0)
        results[qname] = {
            "seconds_by_sf": series,
            "fit_exponent": round(slope, 2),
            "tail_exponent": round(tail, 2),
        }

    out_path = os.path.join(repo, "SCALE_PROBE_ADVERSARIAL.json")
    merged: dict[str, dict] = {}
    if os.path.exists(out_path):
        try:
            merged = json.load(open(out_path)).get("queries", {})
        except (ValueError, OSError):
            merged = {}
    merged.update(results)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "corpus": "50% duplicated volume (clean replicas + verbatim copy)",
                "points_sf": [p[1] for p in points],
                "runs_per_point": n_runs,
                "estimator": "min",
                "queries": merged,
            },
            fh, indent=1,
        )
        fh.write("\n")
    print(f"wrote {out_path}")
    bad = {n: r["tail_exponent"] for n, r in results.items()
           if r["tail_exponent"] > 1.1}
    if bad:
        print("TAILS ABOVE 1.1:", json.dumps(bad))
        raise SystemExit(1)


if __name__ == "__main__":
    main()
