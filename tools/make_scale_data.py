"""Scale-probe data generator: replicate /root/testdata/sf0.1 by an
integer factor k with key offsets, producing .scale/sf{0.1*k}/ inside
the repo (gitignored). Replication preserves join selectivity and
per-key group sizes scale ×k against the fixed dimension tables —
the shape a real 10× ingest has.

Content perturbation per replica keeps the similarity operators
honest:
- documents.text gets a per-replica prefix token, so cross-replica
  texts are near- but not exact-duplicates (the within-replica
  near-dup structure is preserved verbatim).
- embeddings get a per-replica component PERMUTATION, so
  cross-replica vectors decorrelate (cosine ≈ random) — near-dup
  neighborhoods stay constant-size as the corpus grows, which is the
  realistic regime for dedup/ANN scaling (×k data, not ×k² pairs).

Usage: python tools/make_scale_data.py [k ...]   (default: 2 5 10)
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
EMB_DIM = 64
OFFSETS = {
    "orders": {"o_orderkey": 200_000, "o_custkey": 20_000},
    "lineitem": {"l_orderkey": 200_000},
    "customer": {"c_custkey": 20_000},
    "events": {"event_id": 200_000, "user_id": 2_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
}
COPY_AS_IS = ["region", "nation", "supplier", "part"]


def replicate(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from rdsa_utils_spark.sources.readers import read_parquet

    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_AS_IS:
        read_parquet(spark, f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet",
        )
    for t, offs in OFFSETS.items():
        base = read_parquet(spark, f"{SRC}/{t}.parquet")
        pieces = []
        for i in range(k):
            rep = base
            for col, step in offs.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
            if t == "documents" and i > 0:
                rep = rep.withColumn("text", F.concat(F.lit(f"r{i} "), F.col("text")))
                rep = rep.withColumn("n_chars", F.length("text"))
            if t == "embeddings" and i > 0:
                perm = list(range(EMB_DIM))
                random.Random(i).shuffle(perm)
                rep = rep.withColumn(
                    "embedding",
                    F.array(*[F.col("embedding")[perm[j]] for j in range(EMB_DIM)]),
                )
            pieces.append(rep)
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        out.repartition(max(4, 4 * k)).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet",
        )


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_DRIVER_MEM", "48g")
    from rdsa_utils_spark.session import create_spark_session

    factors = [int(a) for a in sys.argv[1:]] or [2, 5, 10]
    spark = create_spark_session(
        "scale-data-gen", size="local",
        extra_configs={
            "spark.ui.showConsoleProgress": "false",
            # micros on disk: portable to any engine without the INT96
            # legacy-type special cases
            "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        },
    )
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")
    for k in factors:
        sf = round(0.1 * k, 2)
        name = f"sf{sf:g}"
        out_dir = os.path.join(root, name)
        if os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
            print(f"{name}: exists, skipping")
            continue
        replicate(spark, k, out_dir)
        print(f"{name}: written to {out_dir}")


if __name__ == "__main__":
    main()
