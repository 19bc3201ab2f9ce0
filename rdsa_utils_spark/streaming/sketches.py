"""Streaming sketch state: per-window HLL distinct sketches.

Extension surface (no reference equivalent; composes
``streaming/windows_time.tumbling_window_agg`` with
``operators/sketches``): the streaming half of the incremental
distinct-count pipeline. Each watermark-closed window emits ONE
~2^lg_k-byte sketch row per (window, key) — bounded state regardless
of event volume — and the batch side answers "distinct users over any
range / any rollup" by ``merge_sketches`` + ``sketch_estimate`` over
the persisted rows, never replaying the stream. HLL union is lossless
for same-``lg_k`` sketches, so the merged answer equals a direct
sketch of the raw events (asserted live in
tests/test_streaming_live.py).

Pure JVM aggregate (``hll_sketch_agg``) inside a standard windowed
aggregation — watermarks, late-data semantics, and append-mode output
behave exactly like any other windowed agg.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.windows_time import tumbling_window_agg

__all__ = ["windowed_distinct_sketch"]


def windowed_distinct_sketch(
    df: DataFrame,
    ts_col: str,
    duration: str,
    value_col: str,
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """Tumbling-window HLL sketch rows — works on streams (pass
    ``watermark``) and batch frames alike: (window_start, window_end,
    keys…, sketch)."""
    return tumbling_window_agg(
        df,
        ts_col=ts_col,
        duration=duration,
        aggs={sketch_col: F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))},
        keys=list(keys),
        watermark=watermark,
    )
