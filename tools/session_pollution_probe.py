"""Reproduce the bench-session slowdown of cheap queries (round 12).

Times two cheap sentinel queries fresh, then runs a block of heavy
registry queries in the same session, then re-times the sentinels.
If the sentinels slow down, the bench session itself is accumulating
state (pinned localCheckpoint blocks, status-store growth, codegen
cache, Python-worker pool) that taxes later queries — the per-query
isolated profiles stay fast while the 250-query bench total inflates.

Usage: python tools/session_pollution_probe.py [n_heavy_blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import __spark_entry__ as entrymod
    from rdsa_utils_spark.session import create_spark_session

    spark = create_spark_session(
        "pollution-probe", size="local",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    sentinels = ["embedding_drift_labels", "kmv_users", "forecast_revenue"]
    heavy = [
        "curation_e2e", "part_communities", "pagerank_parts",
        "dedup_clusters", "jaccard_join", "minhash_near_dedup",
        "substring_dedup", "span_dedup", "bpe_decode_roundtrip",
        "logreg_token_classifier", "tornqvist_prices",
        "chained_price_index", "lm2_quality", "brand_bt_ratings",
        "kmeans_cluster_profile", "dsir_weights", "approx_sketches",
    ]

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def time_sentinels(tag: str) -> None:
        for s in sentinels:
            run(s)  # warmup (codegen)
            ts = [run(s) for _ in range(3)]
            ts.sort()
            print(f"{tag} {s}: median {ts[1]:.3f} runs {[round(t,3) for t in ts]}",
                  flush=True)

    def storage_report(tag: str) -> None:
        sc = spark.sparkContext
        jsc = sc._jsc.sc()
        rdds = jsc.getRDDStorageInfo()
        n = len(rdds)
        mem = sum(r.memSize() for r in rdds)
        print(f"{tag} pinned RDDs: {n}, storage bytes: {mem/1e6:.1f} MB",
              flush=True)

    time_sentinels("FRESH")
    storage_report("FRESH")
    for b in range(blocks):
        t0 = time.perf_counter()
        for h in heavy:
            run(h)
        print(f"heavy block {b + 1}: {time.perf_counter() - t0:.1f}s", flush=True)
        storage_report(f"after block {b + 1}")
        time_sentinels(f"after block {b + 1}")


if __name__ == "__main__":
    main()
