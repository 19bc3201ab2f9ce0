"""Event-sequence analytics: funnels and cohort retention.

Extension surface (no reference equivalent): the standard product /
behavior queries over an event stream (user_id, ts, event_type) that a
warehouse team runs daily at 100 TB.

Both operators are pure DataFrame compositions — no Python in the hot
path, no collect — and both shuffle on ``user_col`` exactly once up
front; every later aggregate either reuses that hash partitioning or
reduces already-narrow frames.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: how many users reached each step, where
    step *k* counts only events at strictly increasing timestamps after
    the user's step *k−1* time (the classic 'signup → activate →
    purchase' progression; ties do NOT advance the funnel).

    Returns ``(step, step_name, n_users)`` with one row per step,
    ordered by step.

    Implementation: one conditional-min aggregation per step over the
    SAME user-hash partitioning — step k's frame joins step k−1's
    per-user time (both sides already partitioned on ``user_col``, so
    Catalyst plans at most one exchange for the whole chain), then the
    tiny per-step counts union. No window over raw events, no sort.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    events = df.select(user_col, ts_col, type_col)
    prev: DataFrame | None = None  # (user_col, __t__) reached-step frame
    counts = []
    for i, step in enumerate(steps):
        matching = events.filter(F.col(type_col) == step)
        if prev is None:
            reached = matching.groupBy(user_col).agg(F.min(ts_col).alias("__t__"))
        else:
            reached = (
                matching.join(prev.withColumnRenamed("__t__", "__prev_t__"), user_col)
                .filter(F.col(ts_col) > F.col("__prev_t__"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t__"))
            )
        counts.append(
            reached.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("step_name"),
                F.count("*").alias("n_users"),
            ),
        )
        prev = reached
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("step")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
    max_periods: int | None = None,
) -> DataFrame:
    """Cohort retention matrix in long form: users are cohorted by
    their first-ever event date (truncated to day), and every event is
    bucketed into ``floor(days_since_cohort / period_days)``; the
    result counts distinct active users per (cohort_date, period).

    Returns ``(cohort_date, period, n_active)`` ordered by cohort then
    period; period 0 is the cohort size itself.

    Implementation: first-event per user is one user-hash aggregation;
    the join back to events is co-partitioned on the same key; the
    final (cohort, period) distinct-count is a partial-aggregated
    shuffle over a frame already reduced to (cohort, period, user).
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    firsts = df.groupBy(user_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("__cohort__"),
    )
    bucketed = (
        df.join(firsts, user_col)
        .select(
            F.col("__cohort__").cast("date").alias("cohort_date"),
            F.floor(
                F.datediff(F.col(ts_col).cast("date"), F.col("__cohort__").cast("date"))
                / period_days,
            ).alias("period"),
            F.col(user_col),
        )
    )
    if max_periods is not None:
        bucketed = bucketed.filter(F.col("period") < max_periods)
    return (
        bucketed.groupBy("cohort_date", "period")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
        .orderBy("cohort_date", "period")
    )
