"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no streaming surface (SURVEY.md §2.10); this is the
engine's extension for arbitrary per-key streaming state that the
built-in windowed aggregations can't express. State lives in Spark's
state store (HDFS/RocksDB-backed on a real cluster), partitioned by
key — the pattern scales horizontally with no driver involvement.

- ``stateful_running_totals`` — per-key running (count, sum) emitted
  on every update; the canonical GroupState example and the template
  for richer accumulators.
- ``stateful_session_counter`` — per-key session counting with an
  event-time timeout: a session closes (and its row emits) only when
  the watermark passes the key's last event + gap — the template for
  per-session custom state that ``F.session_window``'s fixed
  aggregation surface cannot express.
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
    ts_col: str,
    gap_ms: int = 30_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Count events per key per session, where a session CLOSES (and
    its single row emits) once the event-time watermark passes the
    key's last event + ``gap_ms`` — i.e. the key stayed silent for a
    gap of event time. Output schema:
    (key, n_events, session_end timestamp).

    Event-time, not processing-time, on purpose: the close condition
    is a property of the DATA (watermark vs last-event gap), so a
    replay of the same input produces byte-identical sessions —
    testable, recoverable, and immune to executor wall clocks. (A
    processing-time variant additionally trips a Spark 4.1 planner
    bug: timeout-driven no-data micro-batches re-plan
    FlatMapGroupsInPandasWithStateExec with a null thread-local
    session and NPE in PythonSQLMetrics.)

    vs ``F.session_window``: same gap semantics, but the state hook
    supports arbitrary accumulators and mid-session logic (e.g. caps,
    sampling, early emit) that a windowed agg cannot express; this
    counter is the template.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            cnt, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": pd.array([key[0]], dtype="int64"),
                    "n_events": pd.array([cnt], dtype="int64"),
                    "session_end": pd.to_datetime([(last_ms + gap_ms) * 1_000_000]),
                },
            )
        else:
            cnt, last_ms = state.get if state.exists else (0, 0)
            for pdf in pdfs:
                cnt += len(pdf)
                batch_max = pdf[ts_col].max()
                if pd.notna(batch_max):
                    last_ms = max(last_ms, int(pd.Timestamp(batch_max).value // 1_000_000))
            state.update((cnt, last_ms))
            # Close when the watermark passes last event + gap. Spark
            # requires the timeout timestamp to sit beyond the current
            # watermark — a key whose gap has ALREADY elapsed when its
            # late data arrives closes one watermark tick later.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_ms + gap_ms, wm + 1))
            # Nothing emits while the session is open. (Returning
            # without yielding is the supported empty-output path; an
            # empty object-dtype frame would crash Arrow conversion.)
            return

    return stream_df.withWatermark(ts_col, watermark_delay).groupBy(
        key_col,
    ).applyInPandasWithState(
        update,
        outputStructType="key long, n_events long, session_end timestamp",
        stateStructType="cnt long, last_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
