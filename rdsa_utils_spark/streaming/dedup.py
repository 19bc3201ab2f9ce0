"""Streaming deduplication — the ingest-time half of the dedup story.

The batch operators in ``operators/dedup.py`` clean a corpus at rest;
these clean it on the way in (Kafka/file-drop ingestion of documents
or events), with bounded state via watermarks. Batch-first like the
rest of ``streaming/``: every function accepts a batch DataFrame too
and degrades to the equivalent batch dedup, so one code path serves
backfill and live ingest.

Scale notes: ``dropDuplicatesWithinWatermark`` keeps one state row per
key seen within the watermark horizon — state is bounded by (arrival
rate × watermark), not by stream lifetime, and is hash-partitioned on
the dedup key across executors. Fingerprint dedup hashes the document
JVM-side (md5 of normalized text, same fingerprint as the batch path)
BEFORE the stateful operator, so state rows carry a 32-char digest
instead of the document body.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.text import with_fingerprint


def dedup_within_watermark(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``key_cols`` were already seen within the
    watermark horizon.

    Streaming input: applies ``withWatermark(ts_col, watermark)`` and
    ``dropDuplicatesWithinWatermark`` — exactly-once per key within
    the horizon, state bounded by the horizon, late duplicates beyond
    it are (by contract) re-admitted. Batch input: keep the
    MIN-(ts, remaining columns) row per key — a deterministic
    backfill (plain ``dropDuplicates`` keeps a plan-dependent
    arbitrary row, so two runs of the same backfill could emit
    different survivors); when ``ts_col`` is None the min is over the
    row's full column tuple.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if not df.isStreaming:
        others = [c for c in df.columns if c not in keys]
        order = ([ts_col] if ts_col else []) + [c for c in others if c != ts_col]
        if not order:
            return df.dropDuplicates(keys)
        pick = F.min(F.struct(*[F.col(c) for c in order])).alias("__w__")
        return (
            df.groupBy(*keys)
            .agg(pick)
            .select(*keys, *[F.col(f"__w__.{c}").alias(c) for c in order])
            .select(*df.columns)
        )
    if ts_col is None:
        raise ValueError("ts_col is required for streaming input")
    from rdsa_utils_spark.streaming.windows_time import _watermark_safe

    df = _watermark_safe(df, ts_col)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def fingerprint_dedup_stream(
    df: DataFrame,
    text_col: str,
    ts_col: Optional[str] = None,
    watermark: str = "1 hour",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Content-level streaming dedup for document ingest: fingerprint
    the text (md5 of whitespace-normalized, lower-cased content — the
    same digest as the batch ``exact_dedup`` path, so backfill and
    live ingest agree on what counts as a duplicate), then keep the
    first arrival per fingerprint within the watermark horizon.

    The fingerprint column stays in the output for lineage/audit.
    """
    fp = with_fingerprint(df, text_col, out_col=fingerprint_col)
    return dedup_within_watermark(
        fp, [fingerprint_col], ts_col=ts_col, watermark=watermark,
    )


def new_keys_per_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming "new vs returning": count keys whose FIRST arrival
    (within the watermark horizon) lands in each tumbling window —
    the live half of ``operators/events.cumulative_distinct``'s
    first-occurrence trick. A key is counted in exactly one window,
    so a monotonic sink (or a batch running sum over the emitted
    rows) yields the cumulative distinct series.

    Streaming: dedup-first-arrival per key (state = one digest-sized
    row per key in the horizon) feeding a windowed count — both
    stateful operators share the watermark, so state is bounded and
    windows finalize. Batch: min-EVENT-TIME per key then the same
    window bucketing — the deterministic infinite-horizon reference.
    The two agree whenever each key's first event arrives before its
    later ones (in-order ingest); under out-of-order arrival the
    stream keeps the first-ARRIVED row, so a key whose earlier-stamped
    event arrives late can land one window later live than in a batch
    replay — the inherent watermark trade-off, not a bug to paper
    over. Output: (``window_start``, ``window_end``, ``n_new``).
    """
    if not df.isStreaming:
        firsts = df.groupBy(key_col).agg(F.min(ts_col).alias(ts_col))
        bucketed = firsts.groupBy(F.window(ts_col, window)).agg(
            F.count(F.lit(1)).alias("n_new"),
        )
    else:
        deduped = dedup_within_watermark(
            df.select(key_col, ts_col), [key_col],
            ts_col=ts_col, watermark=watermark,
        )
        # The watermark set inside the dedup carries downstream;
        # re-defining it on the same column is illegal in Spark 4.
        bucketed = deduped.groupBy(F.window(ts_col, window)).agg(
            F.count(F.lit(1)).alias("n_new"),
        )
    return bucketed.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_new",
    )
