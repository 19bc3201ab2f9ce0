"""Preference-data model fitting — the pairwise-comparison layer of an
RLHF/ranking pipeline (no reference counterpart; extension surface).

``bt_ratings`` fits the Bradley–Terry model (P(i beats j) =
w_i/(w_i+w_j)) to a frame of pairwise outcomes by Hunter's (2004) MM
algorithm — the standard strength fit behind preference-tuned reward
models, arena-style leaderboards, and judge-vs-judge calibration. The
whole optimization is DataFrame algebra with per-iteration
quantization, so a fixed-iteration ANSI-SQL unroll replays it
bit-for-bit (the same replay device as the logreg / PageRank / Platt
oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bt_ratings"]


def bt_ratings(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
    *,
    iterations: int = 8,
    rating_round: int = 9,
    term_round: int = 12,
) -> DataFrame:
    """Bradley–Terry strengths from pairwise outcomes via the MM
    update (Hunter 2004, eq. 1.6):

    ``w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j)``

    with ``W_i`` = i's total wins and ``n_ij`` = games between i and
    j, then mean-1 normalization (``Σ w = #items``) to pin the scale.
    Returns one row per item: (``item``, ``games``, ``wins``,
    ``rating``), higher = stronger; ordering is the fitted
    preference ranking.

    Replay contract: per-pair terms ``n_ij/(w_i+w_j)`` quantize to
    ``term_round`` dp and sum in decimal (order-exact); the normalized
    rating quantizes to ``rating_round`` dp after EVERY iteration —
    so the fixed-iteration trajectory is engine-independent and a SQL
    oracle can unroll it. Never-winning items converge to rating 0
    (the MM fixed point when W_i = 0 — the model's honest answer).

    100 TB posture: the raw outcome frame reduces to the (item, item)
    game-count matrix in one map-side-combined aggregation; each
    iteration is two equi-joins of that matrix against the
    item-cardinality rating frame plus one groupBy — no driver state,
    no parameter server; ratings are lineage-cut per round
    (``localCheckpoint``, the PageRank device). Ties/self-pairs and
    NULL items are excluded.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w, l = F.col(winner_col), F.col(loser_col)
    outcomes = df.select(w.alias("__w"), l.alias("__l")).filter(
        w.isNotNull() & l.isNotNull() & (w != l),
    )
    games = (
        outcomes.select(F.col("__w").alias("__i"), F.col("__l").alias("__j"))
        .unionAll(
            outcomes.select(
                F.col("__l").alias("__i"), F.col("__w").alias("__j"),
            ),
        )
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)  # reused every iteration
    )
    wins = outcomes.groupBy(F.col("__w").alias("__i")).agg(
        F.count(F.lit(1)).alias("wins"),
    )
    totals = games.groupBy("__i").agg(F.sum("__n").alias("games"))
    items = (
        totals.join(wins, "__i", "left")
        .select(
            "__i",
            "games",
            F.coalesce("wins", F.lit(0)).alias("wins"),
        )
        .localCheckpoint(eager=True)
    )
    n_items = items.count()
    ratings = items.select("__i", F.lit(1.0).alias("__r"))
    for _ in range(iterations):
        denom = (
            games.join(
                ratings.select("__i", F.col("__r").alias("__wi")), "__i",
            )
            .join(
                ratings.select(
                    F.col("__i").alias("__j"), F.col("__r").alias("__wj"),
                ),
                "__j",
            )
            .groupBy("__i")
            .agg(
                F.sum(
                    F.round(
                        F.col("__n") / (F.col("__wi") + F.col("__wj")),
                        term_round,
                    ).cast("decimal(38,12)"),
                ).alias("__d"),
            )
        )
        raw = items.join(denom, "__i").select(
            "__i",
            F.round(
                F.col("wins") / F.col("__d").cast("double"), term_round,
            ).alias("__raw"),
        )
        total = raw.agg(
            F.sum(F.col("__raw").cast("decimal(38,12)"))
            .cast("double")
            .alias("__t"),
        )
        ratings = (
            raw.crossJoin(F.broadcast(total))
            .select(
                "__i",
                F.round(
                    F.col("__raw") * F.lit(float(n_items)) / F.col("__t"),
                    rating_round,
                ).alias("__r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        items.join(ratings, "__i")
        .select(
            F.col("__i").alias("item"),
            "games",
            "wins",
            F.col("__r").alias("rating"),
        )
        .orderBy("item")
    )
