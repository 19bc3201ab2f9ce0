"""Event-time windowed aggregations — batch-first, streaming-ready.

The reference has NO streaming surface (verified in SURVEY.md §2.10);
these are the engine's extension for the ``events`` table. Every
function is expressed with ``F.window`` / ``F.session_window`` /
plain window functions that behave identically on a batch DataFrame
and on a ``readStream`` DataFrame — attach ``withWatermark`` upstream
and the same code runs incrementally with bounded state.

Scale notes: tumbling/sliding aggs shuffle once on (window, keys) and
partial-aggregate map-side. ``sessionize_by_gap`` is the batch
sessionization idiom (lag + cumulative-sum of gap breaks) — one
shuffle on the user key.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _agg_list(aggs: Mapping[str, Column]) -> list[Column]:
    return [expr.alias(name) for name, expr in aggs.items()]


def _watermark_safe(df: DataFrame, ts_col: str) -> DataFrame:
    """``withWatermark`` requires TimestampType; a TIMESTAMP_NTZ event
    column (Spark 4 parquet inference) is rejected with
    ``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``. Reinterpret NTZ as LTZ —
    exact under the engine's UTC session time zone — so streaming works
    regardless of the reader session's inference setting.
    """
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        from rdsa_utils_spark.functions.columns import require_utc_for_ntz

        require_utc_for_ntz(df, ts_col)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows.

    Output carries ``window_start``/``window_end`` timestamp columns
    (flattened from the struct so results are plain-SQL comparable).
    """
    if watermark:
        df = _watermark_safe(df, ts_col).withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("__w__"), *keys).agg(
        *_agg_list(aggs),
    )
    return out.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *[c for c in out.columns if c != "__w__"],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` advancing every ``slide``."""
    if watermark:
        df = _watermark_safe(df, ts_col).withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("__w__"), *keys,
    ).agg(*_agg_list(aggs))
    return out.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *[c for c in out.columns if c != "__w__"],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """Session windows closed after ``gap`` of inactivity
    (``F.session_window`` — works in batch and streaming)."""
    if watermark:
        df = _watermark_safe(df, ts_col).withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("__w__"), *keys,
    ).agg(*_agg_list(aggs))
    return out.select(
        F.col("__w__.start").alias("session_start"),
        F.col("__w__.end").alias("session_end"),
        *[c for c in out.columns if c != "__w__"],
    )


def sessionize_by_gap(
    df: DataFrame,
    ts_col: str,
    key_cols: Union[str, Sequence[str]],
    gap_seconds: float,
    session_col: str = "session_id",
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    Batch idiom: lag(ts) over (key order by ts) → gap>threshold flag →
    running sum of flags = session ordinal. One shuffle on the key.

    ``tiebreak_cols`` (e.g. a unique event id) makes the window ordering
    total when timestamps can collide — the session *count* per key is
    tie-invariant (equal timestamps always have gap 0), but per-row
    session ids are only reproducible run-to-run with a total order.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).asc()]
    order += [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    # timestamp_ntz forbids a direct →double cast; epoch_double routes
    # it via an LTZ cast and enforces a UTC session tz. Numerics and
    # plain timestamps cast straight through.
    from rdsa_utils_spark.functions.columns import epoch_double

    ts_num = epoch_double(df, ts_col)
    prev_num = F.lag(ts_num).over(w)
    is_new = (
        prev_num.isNull() | ((ts_num - prev_num) > F.lit(gap_seconds))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
