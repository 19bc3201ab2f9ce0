"""Naive Bayes trainer/scorer: hand-computed values, empty-doc and
tie-break behavior, plan hygiene."""

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.classify import (
    naive_bayes_score,
    train_naive_bayes,
)


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "spam", "buy cheap pills now"),
            (2, "spam", "cheap pills cheap deal"),
            (3, "ham", "meeting notes for tomorrow"),
            (4, "ham", "lunch tomorrow maybe"),
        ],
        "doc_id long, label string, text string",
    )


def test_train_matches_hand_calc(spark, tiny):
    model, priors = train_naive_bayes(tiny, "label", "text")
    V = 11  # distinct tokens across corpus
    m = {(r.label, r.token): r.log_cond for r in model.collect()}
    # "cheap" under spam: count 3 of 8 spam tokens
    want = round(math.log((3 + 1) / (8 + V)), 9)
    assert m[("spam", "cheap")] == pytest.approx(want, abs=1e-9)
    p = {r.label: (r.log_prior, r.log_default) for r in priors.collect()}
    assert p["spam"][0] == pytest.approx(round(math.log(0.5), 9), abs=1e-9)
    assert p["spam"][1] == pytest.approx(round(math.log(1 / (8 + V)), 9), abs=1e-9)

    with pytest.raises(ValueError, match="smoothing"):
        train_naive_bayes(tiny, "label", "text", smoothing=0.0)


def test_score_predicts_and_handles_empty_docs(spark, tiny):
    model, priors = train_naive_bayes(tiny, "label", "text")
    new = spark.createDataFrame(
        [
            (10, "cheap pills"),
            (11, "meeting tomorrow"),
            (12, ""),            # priors only; 0.5/0.5 tie -> 'ham' (label asc)
            (13, "zzz unseen"),  # all-default tokens; shorter spam denom wins
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.label_pred for r in
           naive_bayes_score(new, model, priors, "doc_id", "text").collect()}
    assert out[10] == "spam"
    assert out[11] == "ham"
    assert out[12] == "ham"    # deterministic tie-break, label ascending
    assert len(out) == 4

    # No row-wise Python, no cartesian beyond the tiny label cross.
    plan = naive_bayes_score(new, model, priors, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "InPandas" not in plan


def test_calibration_bins_hand_computed(spark):
    from rdsa_utils_spark.operators.classify import calibration_bins

    rows = [
        (0.05, 0), (0.08, 0),          # bin 0: rate 0
        (0.55, 1), (0.45, 0),          # bins 2,1
        (0.95, 1), (1.0, 1), (1.4, 1), # clamp: 1.4 -> bin 3
        (-0.2, 0),                     # clamp: -> bin 0
    ]
    df = spark.createDataFrame(rows, ["score", "y"])
    out = {r["bin"]: r for r in calibration_bins(df, "score", "y", n_bins=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n"] == 3 and out[0]["positive_rate"] == 0.0
    assert out[1]["n"] == 1 and out[1]["positive_rate"] == 0.0
    assert out[2]["n"] == 1 and out[2]["positive_rate"] == 1.0
    assert out[3]["n"] == 3 and out[3]["positive_rate"] == 1.0
    assert out[0]["mean_score"] == round((0.05 + 0.08 - 0.2) / 3, 6)

    import pytest as _pt
    with _pt.raises(ValueError):
        calibration_bins(df, "score", "y", n_bins=0)
