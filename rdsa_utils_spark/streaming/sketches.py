"""Streaming sketch state: per-window HLL distinct and count-min
frequency sketches.

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

__all__ = [
    "windowed_distinct_sketch",
    "windowed_freq_sketch",
    "windowed_quantile_sketch",
]


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


def windowed_freq_sketch(
    df: DataFrame,
    ts_col: str,
    duration: str,
    value_col: str,
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
    depth: int = 5,
    width: int = 8192,
    count_col: str = "cnt",
) -> DataFrame:
    """Tumbling-window count-min sketch rows: (window_start,
    window_end, keys…, depth, pos, cnt) — ≤ depth×width rows per
    window per key group regardless of event volume. The cell explode
    is stateless, so the whole thing is an ordinary watermarked
    windowed aggregation; batch-side
    ``operators/sketches.merge_freq_sketches`` /
    ``freq_estimate`` answer any-range frequency questions from the
    persisted rows (merge is sum-by-key — bit-identical to a direct
    build, the same contract as the batch CMS)."""
    from rdsa_utils_spark.operators.sketches import _cms_cells

    cell = F.explode(_cms_cells(value_col, depth, width)).alias("cell")
    exploded = df.select(
        F.col(ts_col), *[F.col(k) for k in keys], cell,
    ).select(
        F.col(ts_col),
        *[F.col(k) for k in keys],
        F.col("cell.depth").alias("depth"),
        F.col("cell.pos").alias("pos"),
    )
    return tumbling_window_agg(
        exploded,
        ts_col=ts_col,
        duration=duration,
        aggs={count_col: F.count(F.lit(1))},
        keys=[*keys, "depth", "pos"],
        watermark=watermark,
    )


def windowed_quantile_sketch(
    df: DataFrame,
    ts_col: str,
    duration: str,
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
    accuracy: int = 10000,
    out_col: str = "quantiles",
) -> DataFrame:
    """Tumbling-window approximate quantiles — the latency/size-
    distribution companion to the distinct and frequency sketches:
    (window_start, window_end, keys…, quantiles array<double>), one
    row per closed window with the requested percentiles in order.

    ``percentile_approx`` (Greenwald-Khanna) is a mergeable
    TypedImperativeAggregate, so it runs inside a watermarked
    streaming window agg exactly like count/sum — bounded sketch
    state per open window, append-mode emission on close. NULL
    values are excluded (the aggregate's own contract, matching
    ``windowed_bin_counts``).
    """
    if not probabilities:
        raise ValueError("probabilities must be non-empty")
    if not all(0.0 <= p <= 1.0 for p in probabilities):
        raise ValueError(f"probabilities must be in [0, 1], got {probabilities}")
    if accuracy <= 0:
        # fail here, not as percentile_approx's opaque analysis error
        # when the streaming query eventually starts
        raise ValueError(f"accuracy must be > 0, got {accuracy}")
    agg = F.percentile_approx(
        F.col(value_col),
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(accuracy),
    )
    return tumbling_window_agg(
        df,
        ts_col=ts_col,
        duration=duration,
        aggs={out_col: agg},
        keys=list(keys),
        watermark=watermark,
    )
