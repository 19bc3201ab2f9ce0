"""DataFrame-native Bloom filter primitives.

OSS Spark does not expose ``bloom_filter_agg`` / ``might_contain`` to
SQL or the Python API, so the engine builds Bloom filters from pure
DataFrame operations (no reference counterpart; extension surface):
each key sets ``k`` seeded ``xxhash64`` bit positions, a ``bit_or``
aggregation packs them into 64-bit words map-side (the shuffle carries
at most ``m/64`` compact partial rows per partition regardless of
build-side size), and the driver densifies the sparse words into one
``array<long>`` bitmap — exactly ``m/8`` bytes, the same payload a
native Bloom broadcast would carry. Probing is ``k``
``getbit(element_at(...))`` expressions inside whole-stage codegen.

Shared by :func:`rdsa_utils_spark.operators.dedup.
dedup_against_corpus_bloom` (fingerprint prefilter) and
:func:`rdsa_utils_spark.operators.joins.bloom_semi_join` (generic
semi/anti join prefilter).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_params", "build_bloom_bitmap", "bloom_probe_expr"]


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal Bloom sizing: m = -n·ln(p)/ln(2)² bits, k = (m/n)·ln 2
    hash functions."""
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if expected_items <= 0:
        raise ValueError(f"expected_items must be > 0, got {expected_items}")
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def build_bloom_bitmap(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k_hashes: int,
    bloom_col: str = "__bloom__",
) -> DataFrame:
    """Build the dense bitmap as a 1-row DataFrame
    ``(bloom_col array<bigint>)`` from the distinct values of
    ``key_col``. The only driver-side work is densifying ≤ ``m/64``
    sparse words; the scan and bit-packing are fully distributed."""
    n_words = (m_bits + 63) // 64
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ],
    )
    sparse = (
        df.select(F.col(key_col)).distinct()
        .select(F.explode(positions).alias("__p__"))
        .select(
            (F.col("__p__") / 64).cast("long").alias("__w__"),
            F.expr("shiftleft(cast(1 as bigint), cast(__p__ % 64 as int))").alias(
                "__b__",
            ),
        )
        .groupBy("__w__")
        .agg(F.bit_or("__b__").alias("__mask__"))
        .collect()
    )
    words = [0] * n_words
    for r in sparse:
        words[r["__w__"]] = r["__mask__"]
    return df.sparkSession.createDataFrame([(words,)], f"{bloom_col} array<bigint>")


def bloom_probe_expr(
    key_col: str,
    m_bits: int,
    k_hashes: int,
    bloom_col: str = "__bloom__",
) -> Column:
    """Boolean membership expression (``k`` getbit lookups, all
    codegen): True = MAYBE present (true member or ~fpp false
    positive), False = DEFINITELY absent."""
    maybe = None
    for i in range(k_hashes):
        p = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        word = F.element_at(bloom_col, (p / 64).cast("int") + F.lit(1))
        hit = F.getbit(word, F.pmod(p, F.lit(64))) == 1
        maybe = hit if maybe is None else (maybe & hit)
    return maybe
