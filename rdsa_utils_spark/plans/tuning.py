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


#: Source bytes of CPU-amplified work per task when deriving a
#: parallelism-floor target from data size (see ensure_parallelism).
#: Deliberately far below the 128 MB-1 GB guide range for plain scans:
#: ensure_parallelism is only applied where downstream per-row work
#: (shingle hashing, n-gram bucketing, vector math, resampling)
#: amplifies each input byte many times over. Overridable per call or
#: via SPARK_GRAFT_SPREAD_TASK_BYTES.
DEFAULT_SPREAD_TASK_BYTES = 64 * 1024


def ensure_parallelism(
    df: DataFrame,
    min_partitions: Optional[int] = None,
    keys: Optional[Sequence[str]] = None,
    bytes_per_task: Optional[int] = None,
) -> DataFrame:
    """Repartition up ONLY when the plan has fewer partitions than the
    DATA warrants — the small-file/local-file case where a downstream
    Arrow UDF or wide expression would otherwise run on one task. A
    no-op (no shuffle inserted) when the input is already parallel
    enough, so it is safe to leave in 100 TB paths where scans arrive
    with thousands of partitions.

    The target (round-13) is derived from the input SIZE, not from the
    core count alone: ``clamp(size_bytes / bytes_per_task, min(8,
    cores), cores)`` using Catalyst's optimized-plan size estimate (no
    job). Guide §2.2/§6: partitions should be sized by data; a core-
    count constant over-splits tiny inputs into per-task fixed costs
    (measured: a 0.6 MB corpus spread 32 ways paid ~0.1 s/task of
    scheduler+GC overhead — 10-20x the useful work; 8-10 tasks ran the
    same queries 1.4-1.7x faster end-to-end at the same core count,
    while an 11 MB fact table still fills every core). The floor of
    ``min(8, cores)`` reflects that callers only apply this device
    where per-byte work is heavy, so raw bytes UNDER-estimate the
    compute; the cap keeps the local exchange no wider than the
    session. When the size estimate is unavailable the target falls
    back to the core count.

    ``keys`` (round-12): hash-repartition on the named high-cardinality
    columns instead of round-robin. Hash partitioning is deterministic
    under task retry and skips round-robin's sort-before-repartition
    pass; picking a downstream join/window/group key lets the exchange
    double as that operator's required partitioning (no second
    shuffle)."""
    if min_partitions is not None:
        target = min_partitions
    else:
        import os

        cores = df.sparkSession.sparkContext.defaultParallelism
        bpt = bytes_per_task or int(
            os.environ.get(
                "SPARK_GRAFT_SPREAD_TASK_BYTES", DEFAULT_SPREAD_TASK_BYTES,
            ),
        )
        try:
            est = plan_size_in_bytes(df)
        except Exception:  # py4j / unresolved-plan edge: fall back
            est = None
        if not est or est <= 0 or est >= (1 << 62):  # unknown estimate
            target = cores
        else:
            target = max(min(8, cores), min(cores, -(-est // bpt)))
    if df.rdd.getNumPartitions() < target:
        if keys:
            return df.repartition(target, *[F.col(k) for k in keys])
        return df.repartition(target)
    return df
