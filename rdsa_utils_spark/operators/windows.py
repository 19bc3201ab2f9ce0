"""Window operators: specs, ranking, first-per-group, deterministic dedup.

Capability parity (re-designed):
- ``get_window_spec`` — reference ``rdsa_utils/helpers/pyspark.py:283-326``.
  The reference silently builds a GLOBAL (unpartitioned) window when no
  partition cols are given — a single-task collapse at scale; ours
  warns loudly in that case (SURVEY.md §7.5).
- ``rank_numeric`` — reference ``helpers/pyspark.py:329-369``
  (row_number, deliberately unique per row).
- ``select_first_obs_appearing_in_group`` — reference
  ``helpers/pyspark.py:455-494``.
- ``drop_duplicates_reproducible`` — reference ``helpers/pyspark.py:1174-1221``.
  The reference falls back to ``monotonically_increasing_id`` which is
  partition-layout-dependent (NOT reproducible across cluster sizes);
  ours requires an explicit tiebreaker column by default and only
  falls back with a warning.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_Cols = Union[str, Column, Sequence[Union[str, Column]]]


def _to_list(cols: Optional[_Cols]) -> list:
    if cols is None:
        return []
    if isinstance(cols, (str, Column)):
        return [cols]
    return list(cols)


def get_window_spec(
    partition_cols: Optional[_Cols] = None,
    order_cols: Optional[_Cols] = None,
) -> WindowSpec:
    """Build a WindowSpec from optional partition/order columns.

    No partition + no order → whole-frame window
    (``rowsBetween(unboundedPreceding, unboundedFollowing)``).
    Order without partition → global sort window; emits a
    RuntimeWarning because it executes as ONE task regardless of
    cluster size.
    """
    partitions = _to_list(partition_cols)
    orders = _to_list(order_cols)
    if partitions and orders:
        return Window.partitionBy(*partitions).orderBy(*orders)
    if partitions:
        return Window.partitionBy(*partitions)
    if orders:
        warnings.warn(
            "get_window_spec: order without partition collapses to a single "
            "task — every row shuffles to one executor. Partition if possible.",
            RuntimeWarning,
            stacklevel=2,
        )
        return Window.orderBy(*orders)
    return Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)


def rank_numeric(
    numeric: Union[str, Column],
    group: Optional[_Cols] = None,
    ascending: bool = False,
    method: str = "row_number",
) -> Column:
    """Rank rows by ``numeric`` within ``group``.

    ``method='row_number'`` (default, matches reference: unique rank
    per row); also exposes ``rank`` and ``dense_rank``.
    """
    order = F.asc(numeric) if ascending else F.desc(numeric)
    partitions = _to_list(group)
    w = Window.partitionBy(*partitions).orderBy(order) if partitions else Window.orderBy(order)
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    if method not in fns:
        raise ValueError(f"rank_numeric: method must be one of {sorted(fns)}")
    return fns[method]().over(w)


def select_first_obs_appearing_in_group(
    df: DataFrame,
    group: Sequence[str],
    date_col: str,
    ascending: bool = True,
) -> DataFrame:
    """Keep the earliest (``ascending=True``) or latest row per group
    by ``date_col``. One shuffle on the group keys."""
    rank_col = rank_numeric(date_col, group, ascending=ascending)
    return (
        df.withColumn("__rank__", rank_col)
        .filter(F.col("__rank__") == 1)
        .drop("__rank__")
    )


def drop_duplicates_reproducible(
    df: DataFrame,
    col: Union[str, Sequence[str]],
    id_col: Optional[str] = None,
) -> DataFrame:
    """Deterministic dedup: keep the row with the smallest ``id_col``
    per key.

    Without ``id_col`` the only available tiebreaker is
    ``monotonically_increasing_id`` — stable only for a fixed
    partition layout; a warning documents that the result may differ
    across cluster sizes (the reference has the same hidden caveat).
    """
    keys = [col] if isinstance(col, str) else list(col)
    made_tiebreaker = False
    if id_col is None:
        warnings.warn(
            "drop_duplicates_reproducible: no id_col given; falling back to "
            "monotonically_increasing_id, which is NOT stable across "
            "different partitionings. Pass an explicit tiebreaker column.",
            RuntimeWarning,
            stacklevel=2,
        )
        df = df.withColumn("__dedup_id__", F.monotonically_increasing_id())
        id_col = "__dedup_id__"
        made_tiebreaker = True
    w = Window.partitionBy(*keys).orderBy(F.col(id_col).asc())
    out = (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    # Only drop the helper column this function itself created — a
    # user column that happens to be named __dedup_id__ (passed as an
    # explicit id_col or just present) must survive.
    return out.drop("__dedup_id__") if made_tiebreaker else out


def top_k_per_group(
    df: DataFrame,
    group: _Cols,
    order_col: Union[str, Column],
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Top-K rows per group (window row_number ≤ K; single shuffle)."""
    rank_col = rank_numeric(order_col, group, ascending=ascending)
    return (
        df.withColumn("__rank__", rank_col)
        .filter(F.col("__rank__") <= k)
        .drop("__rank__")
    )
