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

__all__ = ["train_naive_bayes", "naive_bayes_score", "target_encode_kfold"]


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


def target_encode_kfold(
    df: DataFrame,
    key_col: str,
    label_col: str,
    id_col: str,
    n_folds: int = 5,
    smoothing: float = 20.0,
    seed: str = "te",
    fold_col: str = "fold",
    out_col: str | None = None,
    round_to: int | None = 9,
) -> DataFrame:
    """Out-of-fold target (mean) encoding with additive smoothing —
    the standard leakage-safe way to turn a high-cardinality
    categorical into a numeric feature: each row's encoding is the
    smoothed mean of ``label_col`` over rows of the SAME key in the
    OTHER folds, so a row never sees its own label.

    Fold assignment hashes ``id_col`` (md5, partition-independent —
    same engine-portable recipe as :func:`~rdsa_utils_spark.operators.
    sampling.hash_uniform`), so folds are reproducible across runs and
    engines. Encoding::

        te = (oof_sum + prior * smoothing) / (oof_cnt + smoothing)

    where ``prior`` is itself out-of-fold (global mean excluding the
    row's fold) — keys entirely contained in one fold degrade to the
    prior rather than leaking (oof_cnt = 0 is well-defined for
    smoothing > 0).

    100 TB posture: one (key, fold) aggregation with map-side combine
    (≤ keys × n_folds rows), a per-key rollup of that small frame, one
    fold-level rollup, then broadcast joins back — the corpus itself
    is never shuffled.
    """
    if n_folds < 2:
        raise ValueError("target_encode_kfold: n_folds must be >= 2")
    if smoothing <= 0:
        raise ValueError("target_encode_kfold: smoothing must be > 0")
    out_col = out_col or f"te_{key_col}"
    fold = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))), 1, 12),
            16,
            10,
        ).cast("long"),
        F.lit(n_folds),
    ).cast("int")
    with_fold = df.withColumn(fold_col, fold)
    kf = with_fold.groupBy(key_col, fold_col).agg(
        F.sum(F.col(label_col).cast("double")).alias("__s__"),
        F.count(F.lit(1)).alias("__c__"),
    )
    # per-key totals over the small (key, fold) frame, then OOF by
    # subtraction; same for the global prior at fold level.
    key_tot = kf.groupBy(key_col).agg(
        F.sum("__s__").alias("__ks__"), F.sum("__c__").alias("__kc__"),
    )
    fold_tot = kf.groupBy(fold_col).agg(
        F.sum("__s__").alias("__fs__"), F.sum("__c__").alias("__fc__"),
    )
    grand = kf.agg(F.sum("__s__").alias("__gs__"), F.sum("__c__").alias("__gc__"))
    oof = (
        kf.join(key_tot, key_col)
        .join(fold_tot, fold_col)
        .crossJoin(F.broadcast(grand))
        .select(
            key_col,
            fold_col,
            (F.col("__ks__") - F.col("__s__")).alias("__oof_s__"),
            (F.col("__kc__") - F.col("__c__")).alias("__oof_c__"),
            F.when(
                F.col("__gc__") > F.col("__fc__"),
                (F.col("__gs__") - F.col("__fs__")) / (F.col("__gc__") - F.col("__fc__")),
            ).alias("__prior__"),
        )
    )
    enc = (F.col("__oof_s__") + F.col("__prior__") * F.lit(smoothing)) / (
        F.col("__oof_c__") + F.lit(smoothing)
    )
    enc = F.round(enc, round_to) if round_to is not None else enc
    return (
        with_fold.join(F.broadcast(oof), [key_col, fold_col], "left")
        .withColumn(out_col, enc)
        .drop("__oof_s__", "__oof_c__", "__prior__")
    )
