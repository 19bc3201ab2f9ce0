"""Unit tests for the round-7 split-conformal keep-threshold
(curation.conformal_threshold): the ceil((n+1)(1-alpha))-th smallest
calibration score, grouped and global paths."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.curation import conformal_threshold


def test_global_threshold_is_kth_order_statistic(spark):
    # n = 9 scores 1..9; alpha = 0.2 -> k = ceil(10 * 0.8) = 8
    df = spark.createDataFrame([(float(s),) for s in range(1, 10)], "q double")
    row = conformal_threshold(df, "q", 0.2).collect()[0]
    assert row["n_cal"] == 9 and row["rank"] == 8
    assert row["threshold"] == 8.0


def test_global_coverage_guarantee_empirically(spark):
    # The defining property: at least (1-alpha) of the calibration
    # scores are <= the returned threshold.
    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]]
    df = spark.createDataFrame([(v,) for v in vals], "q double")
    alpha = 0.3
    thr = conformal_threshold(df, "q", alpha).collect()[0]["threshold"]
    frac = sum(v <= thr for v in vals) / len(vals)
    assert frac >= 1.0 - alpha


def test_grouped_path_matches_global_per_group(spark):
    rows = [("a", float(s)) for s in range(1, 10)] + [
        ("b", float(s) * 10) for s in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, q double")
    out = {r["g"]: r for r in conformal_threshold(df, "q", 0.2, by=["g"]).collect()}
    assert out["a"]["rank"] == 8 and out["a"]["threshold"] == 8.0
    # group b: n=5 -> k = ceil(6*0.8) = 5 -> 5th smallest = 50
    assert out["b"]["rank"] == 5 and out["b"]["threshold"] == 50.0


def test_alpha_too_small_yields_null_threshold(spark):
    # n=3, alpha=0.1 -> k = ceil(4*0.9) = 4 > n: no finite threshold
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "q double")
    row = conformal_threshold(df, "q", 0.1).collect()[0]
    assert row["n_cal"] == 3 and row["rank"] == 4
    assert row["threshold"] is None
    # same in the grouped path
    df2 = df.withColumn("g", F.lit("x"))
    row2 = conformal_threshold(df2, "q", 0.1, by=["g"]).collect()[0]
    assert row2["rank"] == 4 and row2["threshold"] is None


def test_null_scores_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (3.0,), (None,)], "q double",
    )
    row = conformal_threshold(df, "q", 0.25).collect()[0]
    assert row["n_cal"] == 3  # NULLs never calibrate
    for bad in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="alpha"):
            conformal_threshold(df, "q", bad)
    empty = spark.createDataFrame([], "q double")
    with pytest.raises(ValueError, match="no non-null"):
        conformal_threshold(empty, "q", 0.2)


def test_tied_boundary_scores_are_value_stable(spark):
    # k-th smallest VALUE is well-defined under ties regardless of order
    df = spark.createDataFrame([(1.0,), (2.0,), (2.0,), (2.0,), (5.0,)], "q double")
    # n=5, alpha=0.4 -> k = ceil(6*0.6) = 4 -> 4th smallest = 2.0
    row = conformal_threshold(df, "q", 0.4).collect()[0]
    assert row["rank"] == 4 and row["threshold"] == 2.0
