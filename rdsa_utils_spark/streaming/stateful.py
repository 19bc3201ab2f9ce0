"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no streaming surface (SURVEY.md §2.10); this is the
engine's extension for arbitrary per-key streaming state that the
built-in windowed aggregations can't express. State lives in Spark's
state store (HDFS/RocksDB-backed on a real cluster), partitioned by
key — the pattern scales horizontally with no driver involvement.

- ``stateful_running_totals`` — per-key running (count, sum) emitted
  on every update; the canonical GroupState example and the template
  for richer accumulators.
- ``stateful_session_counter`` — per-key session counting with a
  processing-time timeout: a session closes (and its row emits) only
  when the key stays silent past the timeout — semantics
  ``F.session_window`` cannot express (it emits on watermark, not on
  per-key silence).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame


def stateful_running_totals(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running event count and value sum across ALL batches —
    unbounded keyed state, updated incrementally, one output row per
    key per batch. Output schema: (key, n_events, total_value).

    Works only on streaming DataFrames (use a plain groupBy/agg in
    batch — same numbers, no state store needed).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cnt, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            tot += float(pdf[value_col].fillna(0.0).sum())
        state.update((cnt, tot))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [cnt], "total_value": [tot]},
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key long, n_events long, total_value double",
        stateStructType="cnt long, tot double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_session_counter(
    stream_df: DataFrame,
    key_col: str,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Count events per key per session, where a session ends when the
    key receives no data for ``timeout_ms`` of processing time. Emits
    (key, n_events) once per CLOSED session via the state timeout
    callback. Output is empty until sessions actually time out."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (cnt,) = state.get
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "n_events": [cnt]})
        else:
            cnt = state.get[0] if state.exists else 0
            for pdf in pdfs:
                cnt += len(pdf)
            state.update((cnt,))
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame({"key": [], "n_events": []})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key long, n_events long",
        stateStructType="cnt long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stateful_debounce(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    min_gap_seconds: int,
):
    """Streaming version of ``operators/events.debounce_events``: emit
    an event only if it is at least ``min_gap_seconds`` after the
    last EMITTED event of its key — per-key ``GroupState`` carries
    the last-kept timestamp across micro-batches, so the greedy
    sequential semantics survive incremental arrival. Output schema:
    (key, ts, n_kept_so_far).

    Ordering contract: events are debounced in (ts) order WITHIN each
    micro-batch and in ARRIVAL order across batches — an event
    arriving in a later batch with an earlier timestamp is compared
    against the newest kept state, exactly like any online
    rate-limiter. For a fully order-insensitive result over a closed
    dataset use the batch operator.
    """
    if min_gap_seconds <= 0:
        raise ValueError(f"min_gap_seconds must be > 0, got {min_gap_seconds}")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = int(min_gap_seconds) * 1_000_000_000

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last, n_kept = state.get if state.exists else (None, 0)
        kept_ts = []
        for pdf in pdfs:
            ts = (
                pdf[ts_col].astype("datetime64[ns]").astype("int64").sort_values()
            )
            for t in ts.tolist():
                if last is None or (t - last) >= gap_ns:
                    kept_ts.append(t)
                    last = t
                    n_kept += 1
        state.update((last if last is not None else 0, n_kept))
        if kept_ts:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(kept_ts),
                    "ts": pd.to_datetime(kept_ts, utc=True),
                    "n_kept_so_far": range(n_kept - len(kept_ts) + 1, n_kept + 1),
                },
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key long, ts timestamp, n_kept_so_far long",
        stateStructType="last_ns long, n_kept long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
