"""Stream-stream event-time interval join — batch-first, streaming-ready.

The reference has no streaming surface (SURVEY.md §2.10); this
extends the engine's streaming tier with the canonical two-stream
join: match rows sharing an equi-key whose event times fall within a
bounded interval of each other. The SAME code path works on batch
DataFrames (plain range-predicate join) and on two ``readStream``
frames, where the time bound + watermarks are exactly what Spark
requires to evict join state — without them a stream-stream join
buffers forever.

Scale notes: the join is an equi-join on the key columns (the time
bound rides along as a post-probe filter), so it shuffles both
streams once on a well-distributed key — never a broadcast-nested-
loop. State size in streaming mode is bounded by
``watermark + interval width`` per key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.windows_time import _watermark_safe

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
    left_watermark: Optional[str] = None,
    right_watermark: Optional[str] = None,
) -> DataFrame:
    """Join rows with equal ``keys`` where ``right_ts`` lies in
    ``[left_ts + lower, left_ts + upper]`` (interval strings, e.g.
    ``"-5 minutes"`` / ``"1 hour"``).

    Output columns: ``keys`` once, then the non-key columns of
    ``left``, then the non-key columns of ``right`` (right-side
    names colliding with a left column get a ``_right`` suffix).
    ``left_ts`` and ``right_ts`` must therefore differ or the right
    one arrives suffixed.

    For streaming inputs pass BOTH watermarks — Spark rejects a
    stream-stream join without watermarks + a time bound, because
    they are what lets it discard buffered state. Outer variants
    (``leftOuter``/``rightOuter``/``fullOuter``) emit unmatched rows
    only once the watermark passes, same as any streaming outer join.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    if left_watermark:
        left = _watermark_safe(left, left_ts).withWatermark(left_ts, left_watermark)
    else:
        left = _watermark_safe(left, left_ts)
    if right_watermark:
        right = _watermark_safe(right, right_ts).withWatermark(
            right_ts, right_watermark,
        )
    else:
        right = _watermark_safe(right, right_ts)

    taken = set(left.columns)
    renames: dict[str, str] = {}
    for c in right.columns:
        if c in keys:
            continue
        if c in taken:
            renames[c] = f"{c}_right"
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)

    l, r = left.alias("__l"), right.alias("__r")
    cond = None
    for k in keys:
        c = F.col(f"__l.{k}") == F.col(f"__r.{k}")
        cond = c if cond is None else (cond & c)
    lts = F.col(f"__l.{left_ts}")
    rts = F.col(f"__r.{r_ts}")
    cond = (
        cond
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    joined = l.join(r, cond, how)
    # Right-only rows in right/full outer joins carry their key on the
    # right side — coalesce so the exposed key is never NULL-by-shape.
    # Normalize `how` the way Spark's JoinType does (lowercase, strip
    # underscores): 'fullouter', 'RIGHT_OUTER' etc. are all legal
    # spellings and must take the coalescing branch too.
    how_norm = how.lower().replace("_", "")
    if how_norm in ("rightouter", "right", "fullouter", "full", "outer"):
        out_cols = [
            F.coalesce(F.col(f"__l.{k}"), F.col(f"__r.{k}")).alias(k) for k in keys
        ]
    else:
        out_cols = [F.col(f"__l.{k}").alias(k) for k in keys]
    out_cols += [F.col(f"__l.{c}") for c in left.columns if c not in keys]
    out_cols += [F.col(f"__r.{c}") for c in right.columns if c not in keys]
    return joined.select(*out_cols)
