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

Round-12 extension — the VECTOR family (``--vectors``): same 50 %
adversary expressed in embedding space
(``.scale/vecdup{X}/embeddings.parquet``):
- the CLEAN half is k re-keyed replicas of sf0.1 embeddings, replica
  i > 0 sign-flipped on a per-(replica, component) murmur3 pattern —
  cross-replica cosine ≈ 0, so replicas never co-bucket;
- the DUP half is k re-keyed VERBATIM copies of replica 0, so every
  base vector forms an exact-duplicate group of size k+1 — group size
  GROWS with sf, the mega-cluster regime that exposed the minhash
  quadratic in round 11 (identical vectors share every LSH bucket in
  every table, exactly like identical texts share every band).
Probed queries: embedding_near_dups, lsh_cosine_topk, plus a
probe-local ``semantic_dedup_lsh`` (the 100 TB LSH path of
``semantic_dedup`` — the registry's declared ``semantic_dedup`` uses
the exact-GEMM baseline, which is documented O(N²) by contract and
therefore not a scaling claim to probe).

Run alone (host noise). Usage:
  python tools/dup_stress_probe.py [runs_per_point] [query ...]
  python tools/dup_stress_probe.py --vectors [runs_per_point] [query ...]
  python tools/dup_stress_probe.py --streaming [runs_per_point]
Defaults: 2 runs; substring_dedup span_dedup (text) /
embedding_near_dups lsh_cosine_topk semantic_dedup_lsh (vectors).
``--streaming`` probes write_stream_near_dedup: fixed-volume
micro-batches with within-batch exact-dup group size growing 1→100 —
per-batch time must not GROW with group size (≤1.5x the
all-distinct g=1 baseline) now that the round-11
collapse is applied inside the gate.
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


def _build_vectors(spark, k: int, out: str) -> None:
    from pyspark.sql import functions as F

    from rdsa_utils_spark.sources.readers import read_parquet

    base = read_parquet(spark, f"{SRC}/embeddings.parquet")
    pieces = []
    for i in range(k):
        rep = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 100_000))
        if i > 0:
            # deterministic per-(replica, component) sign flip: murmur3
            # of (i, j) — flips ~half the components, driving
            # cross-replica cosine to ~0 while keeping each replica's
            # norm and per-component magnitudes identical
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, j: F.when(
                        F.pmod(F.hash(F.lit(i), j), F.lit(2)) == 0, -x,
                    ).otherwise(x),
                ),
            )
        pieces.append(rep)
    clean = pieces[0]
    for p in pieces[1:]:
        clean = clean.unionByName(p)
    # dup half: k VERBATIM copies of replica 0 — exact-dup groups of
    # size k+1 (half the corpus is duplicated volume, group size grows
    # with the scale factor: the mega-cluster adversary)
    dups = []
    for c in range(k):
        dups.append(
            base.withColumn("vec_id", F.col("vec_id") + F.lit((k + c) * 100_000)),
        )
    corpus = clean
    for d in dups:
        corpus = corpus.unionByName(d)
    corpus.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet",
    )


def _semantic_dedup_lsh(spark, sf_dir: str):
    """Probe-local: semantic_dedup on its 100 TB LSH path (the
    declared registry query pins method='exact', the oracle-checkable
    O(N²) baseline — wrong thing to scale-probe)."""
    from rdsa_utils_spark.operators.similarity import semantic_dedup
    from rdsa_utils_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(
        emb, dim=64, threshold=0.35, method="lsh",
        num_tables=32, plane_method="md5",
    )


def _payload_near_dups_raw(spark, sf_dir: str):
    """Probe-local: payload_near_dups WITHOUT the documented
    exact-dedup-first composition — the standalone operator's exposure
    to byte-identical mega-clusters (the declared query runs
    payload_exact_dedup first and is protected by construction)."""
    from rdsa_utils_spark.operators.multimodal import (
        attach_binary_payload,
        payload_near_dups,
    )
    from rdsa_utils_spark.sources.readers import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return payload_near_dups(
        attach_binary_payload(docs, "text"), "payload", "doc_id",
        max_hamming=3,
    )


#: streaming probe: fixed batch volume, growing within-batch
#: exact-dup group size — the gate's per-batch time must not GROW
#: (the round-12 collapse makes within-batch work linear in volume,
#: not quadratic in group size; it typically SHRINKS as distinct
#: texts per batch fall).
STREAM_BATCH_DOCS = 2000
STREAM_GROUP_SIZES = [1, 5, 20, 100]


def _stream_probe(n_runs: int) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from rdsa_utils_spark.session import create_spark_session
    from rdsa_utils_spark.sources.readers import read_parquet
    from rdsa_utils_spark.streaming.dedup import write_stream_near_dedup

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = create_spark_session(
        "dup-stress-probe-stream", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite",
    ).save()

    base_texts = (
        read_parquet(spark, f"{SRC}/documents.parquet")
        .filter(F.length(F.trim("text")) > 0)
        .select("text").distinct().limit(STREAM_BATCH_DOCS)
        .localCheckpoint(eager=True)
    )

    series: dict[str, float] = {}
    for g in STREAM_GROUP_SIZES:
        n_distinct = max(1, STREAM_BATCH_DOCS // g)
        batch = (
            base_texts.limit(n_distinct)
            .select(F.col("text"))
            .crossJoin(spark.range(g).select(F.col("id").alias("__c__")))
            .select(
                (F.monotonically_increasing_id()).alias("id"),
                "text",
            )
            .localCheckpoint(eager=True)
        )
        best = None
        for _ in range(n_runs):
            work = tempfile.mkdtemp(prefix=f"stream_probe_g{g}_")
            feed = os.path.join(work, "feed")
            batch.coalesce(4).write.parquet(feed)
            stream = spark.readStream.schema("id long, text string").parquet(feed)
            t0 = time.perf_counter()
            q = write_stream_near_dedup(
                stream, "text", "id",
                os.path.join(work, "out"),
                os.path.join(work, "state"),
                os.path.join(work, "ckpt"),
                jaccard_threshold=0.8,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            shutil.rmtree(work, ignore_errors=True)
        series[str(g)] = round(best, 3)
        print(
            f"stream gate @ group={g} ({n_distinct}x{g} docs/batch): "
            f"{best:.2f}s", flush=True,
        )

    vals = list(series.values())
    # Directional check: the adversary makes per-batch time GROW with
    # group size (quadratic within-bucket pairs); the collapse makes it
    # SHRINK (fewer distinct texts per fixed-volume batch). Flag only
    # growth over the all-distinct g=1 baseline — a symmetric max/min
    # bound would fail on the healthy shrink direction.
    baseline = vals[0]
    growth = round(max(vals[1:]) / max(baseline, 1e-3), 2)
    entry = {
        "seconds_by_group_size": series,
        "batch_docs": STREAM_BATCH_DOCS,
        "growth_over_distinct_baseline": growth,
        "corpus": (
            "fixed-volume micro-batch, growing within-batch exact-dup "
            "group size (mega-cluster adversary)"
        ),
    }
    out_path = os.path.join(repo, "SCALE_PROBE_ADVERSARIAL.json")
    merged: dict = {}
    doc: dict = {}
    if os.path.exists(out_path):
        try:
            doc = json.load(open(out_path))
            merged = doc.get("queries", {})
        except (ValueError, OSError):
            doc, merged = {}, {}
    merged["stream_near_dedup_gate"] = entry
    doc["queries"] = merged
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}")
    if growth > 1.5:
        print(f"STREAM GATE GROWS WITH GROUP SIZE: x{growth} over g=1")
        raise SystemExit(1)


def main() -> None:
    argv = sys.argv[1:]
    vectors = "--vectors" in argv
    streaming = "--streaming" in argv
    argv = [a for a in argv if a not in ("--vectors", "--streaming")]
    n_runs = int(argv[0]) if argv else 2
    if streaming:
        _stream_probe(n_runs)
        return
    if vectors:
        names = argv[1:] or [
            "embedding_near_dups", "lsh_cosine_topk", "semantic_dedup_lsh",
        ]
    else:
        names = argv[1:] or ["substring_dedup", "span_dedup"]

    os.environ.setdefault("SPARK_LOCAL_DRIVER_MEM", "48g")

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.session import create_spark_session

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    qs["semantic_dedup_lsh"] = _semantic_dedup_lsh
    qs["payload_near_dups_raw"] = _payload_near_dups_raw

    spark = create_spark_session(
        "dup-stress-probe", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite",
    ).save()

    points = []
    for k in FACTORS:
        if vectors:
            out = os.path.join(repo, ".scale", f"vecdup{k}")
            if not os.path.exists(os.path.join(out, "embeddings.parquet")):
                print(
                    f"building {out} (k={k}, 50% duplicated vectors, "
                    f"group size {k + 1})", flush=True,
                )
                _build_vectors(spark, k, out)
        else:
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
            "corpus": (
                "50% duplicated embeddings, exact-dup group size k+1"
                if vectors
                else "50% duplicated text volume (clean replicas + verbatim copy)"
            ),
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
