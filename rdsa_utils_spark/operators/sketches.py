"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's ``hll_sketch_agg`` family).

Extension surface (no reference equivalent — the reference's
``get_unique``/distinct paths are exact only): the 100 TB pattern for
distinct counting is INCREMENTAL — persist one small binary sketch
per (partition, group) as data lands, then answer "distinct users
over any date range / group rollup" by merging sketches, never
rescanning the facts. ``approx_count_distinct`` alone can't do this:
its estimate is final, not mergeable state.

All three operators are plain JVM aggregates (no UDF, no Python):
- ``distinct_sketch``  — facts → per-group sketch rows (the state you
  persist; bytes per sketch ≈ 2^lg_k, default lg_k=12 → ~4 KiB).
- ``merge_sketches``   — sketch rows → coarser groups (union_agg).
- ``sketch_estimate``  — attach the distinct estimate column.

Merging is exact over the sketch state: merging daily sketches gives
the IDENTICAL estimate as sketching the whole range directly (HLL
union is lossless for same-lg_k sketches) — asserted in
tests/test_sketches.py, alongside a measured error bound vs exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketch", "merge_sketches", "sketch_estimate"]


def distinct_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch row per group over ``value_col`` — the
    persistable increment of a distinct-count pipeline. ``lg_k``
    trades size for accuracy (relative error ≈ 1.04/√2^lg_k; 12 →
    ~1.6%)."""
    groups = [F.col(g) for g in group_cols]
    return df.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col),
    )


def merge_sketches(
    df: DataFrame,
    sketch_col: str = "sketch",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Union sketch rows up to coarser groups (or one global row when
    ``group_cols`` is empty). Lossless over the sketch state — the
    merged sketch equals the sketch of the concatenated inputs."""
    groups = [F.col(g) for g in group_cols]
    return df.groupBy(*groups).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col),
    )


def sketch_estimate(
    df: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Attach the distinct-count estimate for each sketch row."""
    return df.withColumn(out_col, F.hll_sketch_estimate(F.col(sketch_col)))
