"""Distributed text classification: multinomial Naive Bayes as pure
DataFrame aggregations.

Extension surface (no reference equivalent). The point is the plan
shape, not the model class: training a text classifier over a 100 TB
corpus reduces to TWO groupBy aggregations (label priors, per-(label,
token) counts) with map-side combine — no parameter server, no driver
state, no Python. Scoring is explode + a broadcast model join + one
sum-per-(doc, label) aggregation and an argmax window. Everything is
log-space with explicit rounding at the edge so an external ANSI-SQL
engine replays the whole train→predict pipeline bit-for-bit (see the
``nb_confusion`` query oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.text import tokens

__all__ = ["train_naive_bayes", "naive_bayes_score"]


def train_naive_bayes(
    df: DataFrame,
    label_col: str,
    text_col: str,
    smoothing: float = 1.0,
    round_to: int = 9,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial Naive Bayes with Laplace smoothing.

    Returns ``(model, priors)``:

    - ``model``: one row per (label, token) seen under that label —
      ``(label, token, log_cond)`` with ``log_cond =
      ln((count + smoothing) / (label_total + smoothing·V))``, V = the
      GLOBAL distinct-token vocabulary size.
    - ``priors``: one row per label — ``(label, log_prior,
      log_default)`` where ``log_default`` is the smoothed
      log-probability of a token NEVER seen under the label
      (``ln(smoothing / (label_total + smoothing·V))``) — scoring
      needs it for out-of-class tokens without materializing the
      |labels| × V dense grid.

    Plan: one explode + groupBy(label, token) for counts (map-side
    combined), one groupBy(label) for totals, a 1-row vocabulary
    scalar attached by broadcast. Log values round to ``round_to``
    (default 9 dp) so downstream score sums replay identically on
    engines with different float fold orders.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    tok = df.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    counts = tok.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("__c__"),
    )
    label_totals = counts.groupBy("label").agg(F.sum("__c__").alias("__n__"))
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("__v__"),
    )
    n_docs = df.count()
    doc_counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("__d__"),
    )

    s = F.lit(float(smoothing))
    denom = F.col("__n__") + s * F.col("__v__")
    model = (
        counts.join(F.broadcast(label_totals), "label")
        .join(F.broadcast(vocab))
        .select(
            "label",
            "token",
            (F.round(F.log((F.col("__c__") + s) / denom), round_to) + F.lit(0.0)).alias(
                "log_cond",
            ),
        )
    )
    priors = (
        doc_counts.join(F.broadcast(label_totals), "label")
        .join(F.broadcast(vocab))
        .select(
            "label",
            (
                F.round(
                    F.log(F.col("__d__") / F.lit(float(n_docs))), round_to,
                )
                + F.lit(0.0)
            ).alias("log_prior"),
            (F.round(F.log(s / denom), round_to) + F.lit(0.0)).alias("log_default"),
        )
    )
    return model, priors


def naive_bayes_score(
    df: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Predict a label per document: ``argmax_label(log_prior +
    Σ_tokens log_cond)`` with unseen-under-label tokens contributing
    the label's ``log_default``. Returns (``id_col``, ``label_pred``,
    ``log_score``); empty documents score on priors alone.

    Plan: explode tokens, cross the (small) label set, LEFT-join the
    broadcast model on (token, label), coalesce misses to
    ``log_default``, one sum per (doc, label), argmax via a window
    ordered (score desc, label asc) — the deterministic tie-break.
    Scores round to ``round_to`` BEFORE the argmax so prediction
    replays across engines. The model frame is the broadcast side:
    |labels|·V rows of (token, label, double) — for vocabularies past
    broadcast size, the same plan runs as a shuffle equi-join on
    token.
    """
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(F.col(text_col))).alias("token"),
    )
    lab = priors.select("label", "log_default")
    scored = (
        tok.crossJoin(F.broadcast(lab))
        .join(F.broadcast(model), ["token", "label"], "left")
        .groupBy("__id", "label")
        .agg(
            F.sum(
                F.when(F.col("token").isNull(), F.lit(0.0)).otherwise(
                    F.coalesce(F.col("log_cond"), F.col("log_default")),
                ),
            ).alias("__s__"),
        )
    )
    total = (
        scored.join(F.broadcast(priors.select("label", "log_prior")), "label")
        .select(
            "__id",
            "label",
            (
                F.round(F.col("log_prior") + F.coalesce(F.col("__s__"), F.lit(0.0)), round_to)
                + F.lit(0.0)
            ).alias("log_score"),
        )
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("log_score").desc(), F.col("label").asc(),
    )
    return (
        total.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(
            F.col("__id").alias(id_col),
            F.col("label").alias("label_pred"),
            "log_score",
        )
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability-diagram data for a probabilistic scorer: scores
    bucketed into ``n_bins`` equal-width bins over [0, 1]; per bin the
    mean score, observed positive rate, and count — well-calibrated
    scores track the diagonal. The gap drives threshold choice for
    quality-filter cutoffs (a score of 0.9 should MEAN 90%).

    Scores outside [0, 1] are clamped into the edge bins; bin index is
    ``min(floor(score·n), n−1)`` so 1.0 lands in the top bin. One
    map-side-combined aggregation — a single shuffle of ``n_bins``
    partial rows per map task at any scale.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col)
    clamped = F.least(F.greatest(s, F.lit(0.0)), F.lit(1.0))
    bin_idx = F.least(
        F.floor(clamped * n_bins).cast("int"), F.lit(n_bins - 1),
    )
    return (
        df.withColumn("bin", bin_idx)
        .groupBy("bin")
        .agg(
            F.round(F.avg(s), round_to).alias("mean_score"),
            F.round(F.avg(F.col(label_col).cast("double")), round_to).alias(
                "positive_rate",
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bin")
    )
