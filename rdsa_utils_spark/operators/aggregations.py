"""Aggregation operators & data-quality checks.

Capability parity (re-designed for scale — the reference's
driver-side ``collect()`` checks become distributed frames, with
driver materialization an explicit final step):
- ``aggregate_col`` — reference ``rdsa_utils/helpers/pyspark.py:1094-1125``.
- ``count_nulls`` — reference ``helpers/pyspark.py:1054-1091``.
- ``get_unique`` / ``distinct_values`` — reference ``helpers/pyspark.py:1128-1171``.
- ``check_year_range`` — reference ``helpers/pyspark.py:1819-1915``.
- ``assert_same_distinct_values`` — reference ``helpers/pyspark.py:1918-2021``
  (two full collects in the reference; ours is two anti-joins +
  ``isEmpty`` — no driver materialization of the value sets).
- ``has_no_nulls`` — reference ``helpers/pyspark.py:1794-1816``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "mean": F.mean,
    "avg": F.mean,
    "count": F.count,
}


def aggregate_col(df: DataFrame, col: str, operation: str) -> float:
    """Single-column aggregate → scalar (explicit driver step)."""
    if operation not in _AGG_FNS:
        raise ValueError(f"aggregate_col: operation must be one of {sorted(_AGG_FNS)}")
    return df.agg(_AGG_FNS[operation](col).alias("v")).first()["v"]


def count_nulls_df(df: DataFrame, subset_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-column null counts as a one-row DataFrame (distributed)."""
    cols = list(subset_cols) if subset_cols else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"count_nulls: columns not in dataframe: {missing}")
    return df.select(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols],
    )


def count_nulls(df: DataFrame, subset_cols: Optional[Sequence[str]] = None) -> pd.DataFrame:
    """Reference-shaped convenience: null counts to pandas."""
    return count_nulls_df(df, subset_cols).toPandas()


def distinct_values(df: DataFrame, col: str, remove_null: bool = False) -> DataFrame:
    """Distinct values of ``col`` as a DataFrame (scales; partial
    aggregation happens map-side before the shuffle)."""
    if col not in df.columns:
        raise ValueError(f"distinct_values: {col!r} not in dataframe")
    out = df.select(col).distinct()
    if remove_null:
        out = out.filter(F.col(col).isNotNull())
    return out


def get_unique(df: DataFrame, col: str, remove_null: bool = False) -> List:
    """Sorted distinct values of ``col`` as a Python list (nulls last).

    Explicit driver materialization of :func:`distinct_values` — only
    for columns known to be low-cardinality.
    """
    rows = distinct_values(df, col, remove_null=remove_null).collect()
    values = [r[0] for r in rows]
    return sorted(values, key=lambda x: (x is None, x))


def has_no_nulls(df: DataFrame, column_name: str) -> bool:
    """True if ``column_name`` contains no NULLs (early-exit probe:
    limit(1) after the filter, not a full count)."""
    if column_name not in df.columns:
        raise ValueError(f"has_no_nulls: {column_name!r} not in dataframe")
    return df.filter(F.col(column_name).isNull()).limit(1).isEmpty()


def check_year_range(
    df: DataFrame,
    start_year: int,
    end_year: int,
    year_col: str,
) -> None:
    """Assert every year in [start_year, end_year] is present in
    ``year_col``. One distinct-aggregate job over a (tiny) year domain."""
    present = {
        r[0] for r in df.select(F.col(year_col).cast("int")).distinct().collect()
    }
    expected = set(range(start_year, end_year + 1))
    missing = sorted(expected - present)
    if missing:
        raise ValueError(f"check_year_range: missing years {missing} in {year_col!r}")


def assert_same_distinct_values(df1: DataFrame, df2: DataFrame, col_name: str) -> None:
    """Assert both frames share an identical distinct-value set for
    ``col_name`` — two anti-join emptiness probes, nothing collected."""
    d1 = df1.select(col_name).distinct()
    d2 = df2.select(col_name).distinct()
    only_1 = d1.join(d2, col_name, "left_anti")
    only_2 = d2.join(d1, col_name, "left_anti")
    problems = []
    if not only_1.isEmpty():
        problems.append(f"values only in df1: {[r[0] for r in only_1.limit(20).collect()]}")
    if not only_2.isEmpty():
        problems.append(f"values only in df2: {[r[0] for r in only_2.limit(20).collect()]}")
    if problems:
        raise ValueError("assert_same_distinct_values: " + "; ".join(problems))


def sum_columns(df: DataFrame, cols_to_sum: Sequence[str], output_col: str) -> DataFrame:
    """Row-wise sum of N columns (NULL treated as NULL, as the
    reference's ``+`` fold does). Reference ``helpers/pyspark.py:1392-1431``."""
    missing = [c for c in cols_to_sum if c not in df.columns]
    if missing:
        raise ValueError(f"sum_columns: columns not in dataframe: {missing}")
    total: Column = F.col(cols_to_sum[0])
    for c in cols_to_sum[1:]:
        total = total + F.col(c)
    return df.withColumn(output_col, total)


def merge_partial_aggregates(
    frames: Sequence[DataFrame],
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge pre-aggregated partial results (per-partition, per-day,
    per-source rollups) into one aggregate table: sums and counts
    add, mins/maxes re-extremize — the algebraic-aggregate merge law
    that makes incremental rollup maintenance possible without
    touching raw history.

    The 100 TB point: re-aggregating a petabyte of history to admit
    one late day is the anti-pattern; keeping additive partials per
    ingest unit and merging them is O(partials), and this operator
    IS that merge — ``unionByName`` + one ``groupBy(keys)`` whose
    map side collapses each input partial locally before the
    shuffle. Works for any aggregate with an associative merge
    (sum/count/min/max here; pair it with ``operators/sketches.py``
    HLL/CMS merges for the approximate ones).
    """
    if not frames:
        raise ValueError("frames must be non-empty")
    if not (list(sum_cols) or list(count_cols) or list(min_cols) or list(max_cols)):
        raise ValueError("at least one aggregate column is required")
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.sum(c).alias(c) for c in count_cols]
    aggs += [F.min(c).alias(c) for c in min_cols]
    aggs += [F.max(c).alias(c) for c in max_cols]
    return merged.groupBy(*keys).agg(*aggs)
