"""Similarity search over embedding columns (array<float>).

No reference equivalent (extension surface). Two tiers:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the candidate corpus; dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM higher-order functions — no
  Python), top-k per query via one window. At 100 TB the corpus side
  streams; only the query side must fit in a broadcast.
- ``lsh_bucketed_topk`` — the scale path: random-hyperplane (SimHash)
  LSH signs each vector into a bucket; candidates are only scored
  within matching buckets (with multi-probe via several tables),
  turning the O(n·q) scan into per-bucket joins. Recall < 1 by
  design; raise ``num_tables`` for recall, lower for speed.
- ``cosine_near_dup_pairs`` — embedding near-dup (cosine ≥ threshold)
  via the same bucketing trick, for dedup pipelines.

Hyperplanes are generated from a seeded NumPy RNG on the driver and
embedded as literal arrays — deterministic across runs and executors.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (deterministic left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (double)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows for each query row.

    Plan: broadcast-nested-loop of the SMALL query frame against the
    corpus (corpus never shuffles for the scoring pass), then one
    window shuffle on query_id for the top-k. Output:
    (query_id, candidate_id, cosine) with deterministic tie-break on
    candidate id.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv__"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("candidate_id"), F.col(corpus_vec).alias("__cv__"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("candidate_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "candidate_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc(),
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def _hyperplane_literals(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def hyperplane_bucket(
    vec: Column,
    planes: Sequence[Sequence[float]],
) -> Column:
    """Sign-pattern bucket id of ``vec`` against literal hyperplanes
    (random-hyperplane LSH: P[same bit] = 1 − θ/π)."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(float(w)) for w in plane])) >= 0, F.lit(1),
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    bucket = F.lit(0)
    for b in bits:
        bucket = bucket * 2 + b
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    bits: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: score only candidates sharing an LSH
    bucket with the query in at least one of ``num_tables`` tables.

    Shuffle profile: corpus and queries each explode ×num_tables and
    hash-join on (table, bucket) — linear in corpus size, no broadcast
    needed, so it scales past ``brute_force_topk`` when the query set
    is large too.
    """
    tables = [
        _hyperplane_literals(dim, bits, seed + t) for t in range(num_tables)
    ]

    def bucketize(df: DataFrame, idc: str, vecc: str, out_id: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_bucket(F.col(vecc), tables[t]).alias("bucket"),
                )
                for t in range(num_tables)
            ],
        )
        return df.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(f"__{out_id}_v__"),
            F.explode(buckets).alias("tb"),
        ).select(out_id, f"__{out_id}_v__", "tb.table", "tb.bucket")

    qb = bucketize(queries, query_id, query_vec, "query_id")
    cb = bucketize(corpus, corpus_id, corpus_vec, "candidate_id")
    joined = qb.join(cb, ["table", "bucket"]).drop("table", "bucket")
    if exclude_self:
        joined = joined.filter(F.col("candidate_id") != F.col("query_id"))
    scored = (
        joined.select(
            "query_id",
            "candidate_id",
            cosine(F.col("__query_id_v__"), F.col("__candidate_id_v__")).alias("cosine"),
        )
        .groupBy("query_id", "candidate_id")
        .agg(F.first("cosine").alias("cosine"))  # dedup multi-table hits
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc(),
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 10,
    num_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold), found via
    multi-table hyperplane bucketing + exact rescoring. Returns
    (id_a, id_b, cosine) with id_a < id_b."""
    tables = [_hyperplane_literals(dim, bits, seed + t) for t in range(num_tables)]
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_bucket(F.col(vec_col), tables[t]).alias("bucket"),
            )
            for t in range(num_tables)
        ],
    )
    b = df.select(
        F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"),
        F.explode(buckets).alias("tb"),
    ).select("__id__", "__v__", "tb.table", "tb.bucket")
    left, right = b.alias("l"), b.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.table") == F.col("r.table"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.__id__") < F.col("r.__id__"),
            ],
        )
        .select(
            F.col("l.__id__").alias("id_a"),
            F.col("r.__id__").alias("id_b"),
            F.col("l.__v__").alias("__va__"),
            F.col("r.__v__").alias("__vb__"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("cosine", cosine(F.col("__va__"), F.col("__vb__")))
        .filter(F.col("cosine") >= threshold)
        .drop("__va__", "__vb__")
    )
