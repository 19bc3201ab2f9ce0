"""Unit tests for operators/disclosure.py (statistical disclosure
control) — hand-built frames; publication-scale paths are
oracle-checked in test_extra_oracles.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.disclosure import (
    dominance_flags,
    k_anonymity_violations,
    round_to_base,
    suppress_small_cells,
)


def test_round_to_base_half_away_from_zero(spark):
    df = spark.createDataFrame(
        [(0,), (2,), (3,), (5,), (7,), (-2,), (-3,), (12,), (-13,)], "v long",
    )
    got = {r.v: r.r for r in df.select("v", round_to_base("v", 5).alias("r")).collect()}
    assert got == {0: 0, 2: 0, 3: 5, 5: 5, 7: 5, -2: 0, -3: -5, 12: 10, -13: -15}
    with pytest.raises(ValueError):
        round_to_base("v", 0)


def test_suppress_small_cells_nulls_and_flags(spark):
    df = spark.createDataFrame(
        [("a", 3, 100.0), ("b", 10, 200.0)], "cell string, n long, v double",
    )
    out = {r.cell: r for r in
           suppress_small_cells(df, "n", ["v"], min_count=5).collect()}
    assert out["a"].v is None and out["a"].suppressed
    assert out["b"].v == 200.0 and not out["b"].suppressed
    # The count column itself is untouched unless listed.
    assert out["a"].n == 3
    with pytest.raises(ValueError):
        suppress_small_cells(df, "n", ["v"], min_count=0)


def test_dominance_flags_np_rule(spark):
    rows = [
        # Cell A: contributors 80/10/10 -> top1 share 0.8.
        ("A", 1, 80.0), ("A", 2, 10.0), ("A", 3, 10.0),
        # Cell B: four equal contributors -> top1 share 0.25.
        ("B", 1, 25.0), ("B", 2, 25.0), ("B", 3, 25.0), ("B", 4, 25.0),
        # Cell C: zero total -> indeterminate, flagged.
        ("C", 1, 0.0),
    ]
    df = spark.createDataFrame(rows, "cell string, sup long, v double")
    out = {r.cell: r for r in
           dominance_flags(df, ["cell"], "sup", "v", n=1, p=0.5).collect()}
    assert out["A"].top_share == pytest.approx(0.8) and out["A"].dominated
    assert out["B"].top_share == pytest.approx(0.25) and not out["B"].dominated
    assert out["C"].top_share is None and out["C"].dominated
    # (2, 0.5): A's top two hold 0.9 -> dominated; B's hold 0.5 (not > p).
    out2 = {r.cell: r for r in
            dominance_flags(df, ["cell"], "sup", "v", n=2, p=0.5).collect()}
    assert out2["A"].dominated and not out2["B"].dominated
    with pytest.raises(ValueError):
        dominance_flags(df, ["cell"], "sup", "v", n=0)
    with pytest.raises(ValueError):
        dominance_flags(df, ["cell"], "sup", "v", p=1.0)


def test_k_anonymity_violations_groups(spark):
    rows = [("x", "u")] * 5 + [("x", "v")] * 2 + [(None, "u")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r.a, r.b): r.n_rows
           for r in k_anonymity_violations(df, ["a", "b"], k=3).collect()}
    # Groups under k=3: (x, v) with 2 rows and the NULL segment with 1.
    assert out == {("x", "v"): 2, (None, "u"): 1}
    with pytest.raises(ValueError):
        k_anonymity_violations(df, ["a"], k=1)
