"""Physical tuning helpers.

Capability parity (public-API re-design):
- ``smart_coalesce`` — reference ``rdsa_utils/helpers/pyspark.py:1604-1695``
  (Catalyst ``sizeInBytes`` statistic → coalesce to ~target file size).
- ``cut_lineage`` — reference ``helpers/pyspark.py:540-592`` did a JVM
  RDD round-trip; ``localCheckpoint`` is the sanctioned equivalent
  (truncates the logical plan, keeps data on executors).
- ``cache_time_df`` — reference ``helpers/pyspark.py:1031-1051``.
- ``set_df_columns_nullable`` — reference ``helpers/pyspark.py:40-77``.
  The RDD rebuild is kept behind an explicit opt-in; the default is a
  cast-projection which preserves the plan (cannot force
  nullable=False, documented).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_TARGET_FILE_SIZE = 512 * 1024 * 1024  # 512 MB, matching reference


def plan_size_in_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size statistic for ``df`` (bytes)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def smart_coalesce(
    df: DataFrame,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
) -> DataFrame:
    """Coalesce so each output file is ~``target_file_size`` bytes.

    Uses the optimizer's size estimate (no job). ``coalesce`` avoids a
    shuffle; the documented caveat is that it narrows parallelism of
    the final stage, so call it immediately before a write, never
    mid-pipeline.
    """
    size = plan_size_in_bytes(df)
    n_files = max(1, size // target_file_size)
    return df.coalesce(int(n_files))


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate the logical plan (OOM / planner-blowup escape hatch)."""
    return df.localCheckpoint(eager=eager)


def cache_time_df(df: DataFrame) -> Tuple[DataFrame, float, int]:
    """Cache + materialize; returns (df, seconds, row_count)."""
    start = time.perf_counter()
    df = df.cache()
    n = df.count()
    return df, time.perf_counter() - start, n


def set_df_columns_nullable(
    spark: SparkSession,
    df: DataFrame,
    column_list: Optional[Sequence[str]] = None,
    nullable: bool = True,
    use_rdd_rebuild: bool = False,
) -> DataFrame:
    """Flip ``StructField.nullable`` on the named columns.

    Default path: cast-projection (plan-preserving; can only relax to
    nullable=True). ``use_rdd_rebuild=True`` reproduces the
    reference's exact semantics (can force nullable=False) at the cost
    of an RDD round-trip — guard for small frames only.
    """
    cols = set(column_list) if column_list else set(df.columns)
    new_fields = [
        T.StructField(
            f.name,
            f.dataType,
            nullable if f.name in cols else f.nullable,
            f.metadata,
        )
        for f in df.schema.fields
    ]
    new_schema = T.StructType(new_fields)
    if use_rdd_rebuild:
        return spark.createDataFrame(df.rdd, new_schema)
    # Plan-preserving path: DataFrame.to(schema) (Spark ≥3.4) projects
    # onto the target schema without leaving Catalyst. It can relax
    # nullability (False→True) but refuses to fabricate non-nullability.
    return df.to(new_schema)


def ensure_parallelism(
    df: DataFrame,
    min_partitions: Optional[int] = None,
    keys: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Repartition up ONLY when the plan has fewer partitions than the
    cluster has cores — the small-file/local-file case where a
    downstream Arrow UDF or wide expression would otherwise run on one
    task. A no-op (no shuffle inserted) when the input is already
    parallel enough, so it is safe to leave in 100 TB paths where scans
    arrive with thousands of partitions.

    ``keys`` (round-12): hash-repartition on the named high-cardinality
    columns instead of round-robin. Hash partitioning is deterministic
    under task retry and skips round-robin's sort-before-repartition
    pass; picking a downstream join/window/group key lets the exchange
    double as that operator's required partitioning (no second
    shuffle)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if keys:
            return df.repartition(target, *[F.col(k) for k in keys])
        return df.repartition(target)
    return df
