"""Similarity search over embedding columns (array<float>).

No reference equivalent (extension surface). Two tiers:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the candidate corpus; dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM higher-order functions — no
  Python), norms precomputed per side so each pair costs ONE dot
  product, top-k per query via one window. At 100 TB the corpus side
  streams; only the query side must fit in a broadcast.
- ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH signs
  each vector into one bucket per table; candidates are scored only
  within matching buckets. Bucketing runs as ONE Arrow-vectorized
  pandas UDF per side (a single numpy matmul against the
  (dim × tables·bits) plane matrix), not per-plane expressions.
  Recall < 1 by design; raise ``num_tables`` for recall.
- ``cosine_near_dup_pairs`` — embedding near-dup (cosine ≥ threshold)
  via the same bucketing, for dedup pipelines.

Hyperplanes come from a seeded NumPy RNG on the driver, closed over
by the UDF — deterministic across runs and executors.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
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


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc(),
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


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
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv__"),
        _norm(F.col(query_vec)).alias("__qn__"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("candidate_id"),
        F.col(corpus_vec).alias("__cv__"),
        _norm(F.col(corpus_vec)).alias("__cn__"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("candidate_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "candidate_id",
        (_dot(F.col("__qv__"), F.col("__cv__")) / (F.col("__qn__") * F.col("__cn__"))).alias("cosine"),
    )
    return _topk_per_query(scored, k)


def _bucket_udf(dim: int, bits: int, num_tables: int, seed: int):
    """Pandas UDF: embedding → array of ``num_tables`` bucket ids.

    One numpy matmul per Arrow batch against the (dim, tables·bits)
    hyperplane matrix; sign bits pack into per-table integers.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_tables * bits))
    weights = (1 << np.arange(bits, dtype=np.int64))  # bit → integer

    @F.pandas_udf("array<long>")
    def bucketize(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim), float32 ok
        signs = (mat.astype(np.float64) @ planes) >= 0  # (n, tables·bits)
        signs = signs.reshape(len(mat), num_tables, bits)
        buckets = (signs * weights).sum(axis=2)  # (n, tables)
        return pd.Series(list(buckets))

    return bucketize


def _with_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    dim: int,
    bits: int,
    num_tables: int,
    seed: int,
    keep_vec: bool = True,
) -> DataFrame:
    bucketize = _bucket_udf(dim, bits, num_tables, seed)
    cols = [F.col(id_col).alias(out_id)]
    if keep_vec:
        cols.append(F.col(vec_col).alias(f"__{out_id}_v__"))
    out = df.select(*cols, F.posexplode(bucketize(F.col(vec_col))).alias("table", "bucket"))
    return out


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

    Shuffle profile: each side explodes ×num_tables and hash-joins on
    (table, bucket) — linear in corpus size, no broadcast required, so
    it scales past ``brute_force_topk`` when the query set is large
    too. P[bit match] = 1 − θ/π per hyperplane.
    """
    qb = _with_buckets(queries, query_id, query_vec, "query_id", dim, bits, num_tables, seed)
    cb = _with_buckets(corpus, corpus_id, corpus_vec, "candidate_id", dim, bits, num_tables, seed)
    joined = qb.join(cb, ["table", "bucket"]).drop("table", "bucket")
    if exclude_self:
        joined = joined.filter(F.col("candidate_id") != F.col("query_id"))
    # Dedup multi-table hits BEFORE scoring so each pair costs one dot.
    pairs = joined.dropDuplicates(["query_id", "candidate_id"])
    scored = pairs.select(
        "query_id",
        "candidate_id",
        cosine(F.col("__query_id_v__"), F.col("__candidate_id_v__")).alias("cosine"),
    )
    return _topk_per_query(scored, k)


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
    b = _with_buckets(df, id_col, vec_col, "nid", dim, bits, num_tables, seed)
    left = b.select(
        F.col("table"), F.col("bucket"),
        F.col("nid").alias("id_a"), F.col("__nid_v__").alias("__va__"),
    )
    right = b.select(
        F.col("table"), F.col("bucket"),
        F.col("nid").alias("id_b"), F.col("__nid_v__").alias("__vb__"),
    )
    pairs = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("cosine", cosine(F.col("__va__"), F.col("__vb__")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_bucket(
    vec: Column,
    planes: Sequence[Sequence[float]],
) -> Column:
    """Expression-only sign-pattern bucket (kept for environments where
    Arrow/pandas UDFs are unavailable; the UDF path is ~10× faster)."""
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
