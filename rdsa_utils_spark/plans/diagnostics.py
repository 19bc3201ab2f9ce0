"""Data-distribution diagnostics that inform physical tuning.

Extension surface (no reference equivalent): before choosing a salt
factor, an AQE skew threshold, or a broadcast side at 100 TB, you need
to KNOW the key distribution — this module measures it with one
aggregation instead of guessing from failed stages.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_cols: str | Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Heavy-hitter report for a prospective shuffle key: the ``top_n``
    most frequent key values with their row count, share of all rows,
    and skew ratio (count ÷ mean rows per key). A skew ratio ≫ 1 on the
    join/group key predicts straggler tasks; feed those keys to
    ``salted_join`` or raise ``spark.sql.adaptive.skewJoin`` thresholds.

    Shape: one groupBy on the candidate keys (map-side combined — the
    same shuffle the real query would do, so the report costs no more
    than the query's first stage), a broadcast single-row stats attach,
    and a TakeOrderedAndProject for the top-N. Ratios round to 6
    decimals for cross-engine comparability.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*keys).agg(F.count("*").alias("key_count"))
    stats = counts.agg(
        F.sum("key_count").alias("__total__"),
        F.count("*").alias("__n_keys__"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "key_count",
            F.round(F.col("key_count") / F.col("__total__"), 6).alias("share"),
            F.round(
                F.col("key_count") / (F.col("__total__") / F.col("__n_keys__")), 6,
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("key_count"), *keys)
        .limit(top_n)
    )
