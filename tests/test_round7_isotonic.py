"""Unit tests for round-7 isotonic calibration
(classify.isotonic_calibrate / isotonic_apply): the minimax
formulation must equal the sequential pool-adjacent-violators walk."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.classify import (
    isotonic_apply,
    isotonic_calibrate,
)


def _pav(points):
    """Sequential PAV over [(n, n_pos)] ordered by score; returns the
    fitted value per input position — the textbook reference."""
    stack = []  # [n, sum_y, n_positions]
    for n, sy in points:
        stack.append([n, float(sy), 1])
        while len(stack) > 1 and (
            stack[-2][1] / stack[-2][0] >= stack[-1][1] / stack[-1][0]
        ):
            n2, s2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
            stack[-1][2] += c2
    out = []
    for n, sy, c in stack:
        out.extend([sy / n] * c)
    return out


def _frame(spark, per_score):
    # per_score: {score: (n, n_pos)}
    rows = []
    for s, (n, npos) in per_score.items():
        rows += [(float(s), 1.0)] * npos + [(float(s), 0.0)] * (n - npos)
    return spark.createDataFrame(rows, "s double, y double")


def test_hand_computed_violation_pooling(spark):
    df = _frame(
        spark,
        {1: (10, 1), 2: (10, 6), 3: (10, 4), 4: (10, 8), 5: (10, 7)},
    )
    out = isotonic_calibrate(df, "s", "y", score_round=1).collect()
    assert [r["p_cal"] for r in out] == [0.1, 0.5, 0.5, 0.75, 0.75]
    assert [r["n_pos"] for r in out] == [1, 6, 4, 8, 7]


def test_matches_sequential_pav_on_random_tables(spark):
    rng = random.Random(7)
    for trial in range(5):
        ks = rng.randint(3, 12)
        per_score = {
            k: (rng.randint(1, 20), 0) for k in range(ks)
        }
        per_score = {
            k: (n, rng.randint(0, n)) for k, (n, _) in per_score.items()
        }
        df = _frame(spark, per_score)
        got = [
            r["p_cal"]
            for r in isotonic_calibrate(df, "s", "y", score_round=0).collect()
        ]
        want = [
            round(v, 6)
            for v in _pav([per_score[k] for k in sorted(per_score)])
        ]
        assert got == pytest.approx(want), f"trial {trial}: {got} != {want}"


def test_monotone_and_mass_preserving(spark):
    rng = random.Random(11)
    per_score = {k: (rng.randint(2, 15), 0) for k in range(8)}
    per_score = {k: (n, rng.randint(0, n)) for k, (n, _) in per_score.items()}
    df = _frame(spark, per_score)
    rows = isotonic_calibrate(df, "s", "y", score_round=0).collect()
    p = [r["p_cal"] for r in rows]
    assert p == sorted(p)  # non-decreasing
    # PAV preserves total positive mass: sum(n * p_cal) == sum(n_pos)
    mass = sum(r["n"] * r["p_cal"] for r in rows)
    assert mass == pytest.approx(sum(r["n_pos"] for r in rows), abs=1e-3)


def test_already_monotone_input_is_identity(spark):
    df = _frame(spark, {1: (10, 1), 2: (10, 5), 3: (10, 9)})
    out = isotonic_calibrate(df, "s", "y", score_round=1).collect()
    assert [r["p_cal"] for r in out] == [0.1, 0.5, 0.9]


def test_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (None, 1.0), (1.0, None), (2.0, 0.0)],
        "s double, y double",
    )
    rows = isotonic_calibrate(df, "s", "y").collect()
    assert sum(r["n"] for r in rows) == 2
    with pytest.raises(ValueError, match="score_round"):
        isotonic_calibrate(df, "s", "y", score_round=-1)


def test_apply_is_backward_step_function(spark):
    cal_src = _frame(spark, {1: (10, 2), 3: (10, 8)})
    cal = isotonic_calibrate(cal_src, "s", "y", score_round=1)
    new = spark.createDataFrame(
        [(0.5,), (1.0,), (2.0,), (3.0,), (9.0,)], "s double",
    )
    got = {
        r["s"]: r["p_cal"]
        for r in isotonic_apply(new, cal, "s", score_round=1).collect()
    }
    assert got[0.5] is None  # below the calibration range
    assert got[1.0] == 0.2
    assert got[2.0] == 0.2  # steps hold until the next knot
    assert got[3.0] == 0.8
    assert got[9.0] == 0.8
