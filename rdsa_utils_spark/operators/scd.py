"""Slowly-changing-dimension (SCD type 2) maintenance.

Extension surface (no reference equivalent — the reference's Hive
append/overwrite writers, cdp/io/output.py:33-228, can replace a
dimension but cannot maintain version history): the standard
warehouse pattern for dimensions that change over time — every key
carries a chain of versions with ``[valid_from, valid_to)`` intervals
and an ``is_current`` flag, and queries join facts to the version
that was live at the fact's timestamp.

Design (Spark-first, set-based — no MERGE loop):
- ``scd2_apply`` rebuilds each key's version chain with ONE window
  over (key, valid_from): union ALL existing versions with updates,
  drop no-op versions (every tracked attribute eqNullSafe-equal to
  the previous version), then ``lead(valid_from)`` closes each
  version. Re-deriving the full chain (not just the live segment) is
  what makes batch replay and late-arriving corrections exactly
  deterministic — property-tested in tests/test_properties.py.
- ``snapshot_as_of`` is a pure filter — partition/predicate pushdown
  applies, no shuffle.

100 TB posture: one hash shuffle on the key columns (the window) —
the same shape as any keyed dedup, over versions × keys rows (a
dimension, not a fact table). Attribute comparison happens inside
the window projection (JVM, codegen), so wide dimensions don't add
exchanges. To bound a batch to the touched part of a huge dimension,
pre-filter ``dim`` to the update batch's keys (semi-join) and union
the untouched remainder back after — the caller's partitioning
choice, exactly as with ``merge_upsert``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_init", "scd2_apply", "snapshot_as_of", "scd2_compact", "point_in_time_join"]

#: Open-ended ``valid_to`` for current rows. A sentinel (not NULL) so
#: interval predicates (``ts < valid_to``) need no NULL branch and
#: stay pushdown-friendly. NOT the conventional 9999-12-31: that
#: instant overflows Arrow/pandas timestamp[ns] (max 2262-04-11), and
#: this engine's Arrow interop (pandas UDFs, toPandas) must be able
#: to carry the dimension frame.
END_OF_TIME = "2261-12-31 00:00:00"


def scd2_init(
    df: DataFrame,
    valid_from,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Turn a plain dimension frame into an SCD2 table: every row
    becomes the sole, current version effective at ``valid_from`` (a
    Column or a literal timestamp string)."""
    vf = valid_from if not isinstance(valid_from, str) else F.lit(valid_from).cast("timestamp")
    return (
        df.withColumn(valid_from_col, vf)
        .withColumn(valid_to_col, F.lit(END_OF_TIME).cast("timestamp"))
        .withColumn(current_col, F.lit(True))
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    drop_unchanged: bool = True,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension, returning the new
    dimension frame.

    ``dim`` carries ``keys + attrs + valid_from/valid_to/is_current``
    (see :func:`scd2_init`); ``updates`` carries ``keys + attrs +
    effective_col`` and MAY hold many updates per key — chains are
    rebuilt in ``effective_col`` order in one pass, so replaying a
    backlog batch-by-batch or all at once yields the same table.

    With ``drop_unchanged`` (default), an update whose tracked
    ``attrs`` all match the previous version (null-safe) creates no
    new version — the previous version's interval simply extends.

    Updates strictly older than a key's current version raise no
    error; they splice into the chain at their effective time and the
    ENTIRE chain (closed history included) is re-derived. (The window
    therefore carries every existing version of the dimension, not
    just current rows — the right trade for a dimension table, whose
    size is versions-per-key × keys, dwarfed by any fact table.)

    Replay determinism — two precise guarantees:

    - With ``drop_unchanged=False`` nothing is ever discarded, so
      applying an update stream in ANY batch split (including
      out-of-order, late-arriving batches) yields the identical
      table.
    - With ``drop_unchanged=True`` (default) equivalence holds for
      every event-time-ordered split (each batch's updates not
      earlier than the previous batch's). It can NOT hold for
      arbitrary interleaves: an update deduped as a no-op in an
      early batch (value equal to its then-neighbour) is
      load-bearing if a later batch splices a different value
      between the two — information a compacted chain no longer
      carries. Feed out-of-order backlogs either in one batch or
      with ``drop_unchanged=False``.

    ``(keys, effective_col)`` should be unique per update row; when a
    key can receive two updates at the same effective instant, pass
    ``tiebreak_cols`` to make the chain order total — otherwise the
    version order among ties is partition-dependent.
    """
    keys = list(keys)
    attrs = list(attrs)
    if not keys:
        raise ValueError("keys must be non-empty")
    if not attrs:
        raise ValueError("attrs must be non-empty")
    missing = [c for c in keys + attrs + [effective_col] if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing columns: {missing}")

    # Every existing version (closed history too) re-enters the chain
    # rebuild: a late update may land before a closed version, which
    # must then re-close against the new neighbour.
    versions = dim.select(*keys, *attrs, valid_from_col)
    incoming = updates.select(
        *keys, *attrs, F.col(effective_col).cast("timestamp").alias(valid_from_col),
    )
    combined = versions.unionByName(incoming)

    ordering = [F.col(valid_from_col).asc()]
    ordering += [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    if drop_unchanged:
        same_as_prev = F.lit(True)
        for a in attrs:
            same_as_prev = same_as_prev & F.col(a).eqNullSafe(F.lag(a).over(w))
        combined = (
            combined.withColumn("__noop__", F.coalesce(same_as_prev, F.lit(False)))
            .filter(~F.col("__noop__"))
            .drop("__noop__")
        )
        # Re-rank after dropping no-ops so lead() skips them entirely.
        w = Window.partitionBy(*keys).orderBy(*ordering)

    nxt = F.lead(valid_from_col).over(w)
    return combined.select(
        *keys,
        *attrs,
        F.col(valid_from_col),
        F.coalesce(nxt, F.lit(END_OF_TIME).cast("timestamp")).alias(valid_to_col),
        nxt.isNull().alias(current_col),
    )


def snapshot_as_of(
    dim: DataFrame,
    ts,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """The dimension as it stood at ``ts`` (Column or literal
    timestamp string): rows whose ``[valid_from, valid_to)`` interval
    contains ``ts``. Pure filter — pushdown-friendly, no shuffle."""
    t = ts if not isinstance(ts, str) else F.lit(ts).cast("timestamp")
    return dim.filter((F.col(valid_from_col) <= t) & (t < F.col(valid_to_col)))


def scd2_compact(
    dim: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Merge consecutive versions whose tracked ``attrs`` are equal
    (null-safe) into one interval — the compaction that turns a
    dimension maintained with ``drop_unchanged=False`` (every update
    kept, full out-of-order replayability) into the compacted chain
    ``drop_unchanged=True`` would have produced.

    The intended 100 TB workflow for out-of-order backlogs: ingest
    with ``drop_unchanged=False`` (lossless, any batch split), then
    ``scd2_compact`` once the stream is caught up. One window pass
    per key (keep the FIRST version of each same-value run, via lag)
    and one lead() re-tiling — identical shuffle shape to
    ``scd2_apply`` itself.
    """
    keys = list(keys)
    attrs = list(attrs)
    w = Window.partitionBy(*keys).orderBy(F.col(valid_from_col).asc())
    same_as_prev = F.lit(True)
    for a in attrs:
        same_as_prev = same_as_prev & F.col(a).eqNullSafe(F.lag(a).over(w))
    kept = (
        dim.withColumn("__noop__", F.coalesce(same_as_prev, F.lit(False)))
        .filter(~F.col("__noop__"))
        .drop("__noop__")
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(valid_from_col).asc())
    nxt = F.lead(valid_from_col).over(w2)
    return kept.select(
        *keys,
        *attrs,
        F.col(valid_from_col),
        F.coalesce(nxt, F.lit(END_OF_TIME).cast("timestamp")).alias(valid_to_col),
        nxt.isNull().alias(current_col),
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    fact_ts: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join: every fact row picks the
    dimension VERSION that was valid at the fact's own timestamp —
    the correct way to join facts to an SCD2 dimension
    (``snapshot_as_of`` answers "the dim at one instant"; this
    answers "each fact against the dim as of itself", which a plain
    key join silently gets wrong by attaching today's attributes to
    yesterday's facts — training-data leakage in feature pipelines).

    Plan: an EQUI-join on the business key with the interval
    predicate ``valid_from <= ts < valid_to`` as a residual filter —
    one hash shuffle, never a range/cross join, because version
    intervals per key are disjoint and few (the fanout before the
    residual is bounded by versions-per-key). Version columns stay in
    the output for audit.
    """
    cond = [facts[k] == dim[k] for k in keys]
    t = facts[fact_ts]
    interval = (dim[valid_from_col] <= t) & (t < dim[valid_to_col])
    joined = facts.join(dim, [*cond, interval], how)
    # drop the dim's duplicate key columns (join kept both sides)
    for k in keys:
        joined = joined.drop(dim[k])
    return joined
