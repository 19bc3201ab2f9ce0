"""Unit tests for round-7 ECE (classify.expected_calibration_error),
Törnqvist index (stats.tornqvist_index) and Neyman-allocation
sampling (sampling.neyman_sample)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.classify import expected_calibration_error
from rdsa_utils_spark.operators.sampling import neyman_sample
from rdsa_utils_spark.operators.stats import tornqvist_index


# ------------------------------------------------------------------ ece


def test_ece_hand_computed_two_bins(spark):
    # bin 0 (scores ~0.1): mean score 0.1, pos rate 0.5 -> gap 0.4, n=4
    # bin 9 (scores ~0.95): mean 0.95, pos rate 1.0 -> gap 0.05, n=2
    rows = [(0.1, 1), (0.1, 0), (0.1, 1), (0.1, 0), (0.95, 1), (0.95, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = expected_calibration_error(df, "s", "y").collect()[0]
    want = (4 * 0.4 + 2 * 0.05) / 6
    assert out["n"] == 6 and out["n_bins_used"] == 2
    assert out["ece"] == pytest.approx(round(want, 6), abs=1e-9)


def test_ece_perfectly_calibrated_is_zero(spark):
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)] * 5
    df = spark.createDataFrame(rows, "s double, y int")
    assert expected_calibration_error(df, "s", "y").collect()[0]["ece"] == 0.0


def test_ece_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [(0.5, 1), (None, 1), (0.5, None)], "s double, y int",
    )
    assert expected_calibration_error(df, "s", "y").collect()[0]["n"] == 1
    with pytest.raises(ValueError, match="n_bins"):
        expected_calibration_error(df, "s", "y", n_bins=0)


# ------------------------------------------------------------ tornqvist


def _panel(spark, rows):
    return spark.createDataFrame(
        rows, "period int, item string, price double, qty double",
    )


def test_tornqvist_hand_computed(spark):
    rows = [
        (0, "a", 10.0, 2.0), (0, "b", 5.0, 4.0),
        (1, "a", 12.0, 2.0), (1, "b", 6.0, 3.0),
    ]
    out = {
        r["period"]: r
        for r in tornqvist_index(
            _panel(spark, rows), "period", "item", "price", "qty", 0,
        ).collect()
    }
    e0 = {"a": 20.0, "b": 20.0}
    e1 = {"a": 24.0, "b": 18.0}
    t0, t1 = sum(e0.values()), sum(e1.values())
    want = 100.0 * math.exp(
        sum(
            round(
                (e0[i] / t0 + e1[i] / t1) / 2 * math.log(p1 / p0), 12,
            )
            for i, p0, p1 in [("a", 10.0, 12.0), ("b", 5.0, 6.0)]
        ),
    )
    assert out[0]["tornqvist"] == pytest.approx(100.0, abs=1e-6)
    assert out[1]["tornqvist"] == pytest.approx(round(want, 6), abs=1e-6)
    assert out[1]["n_items"] == 2


def test_tornqvist_between_laspeyres_and_paasche(spark):
    # classic superlative property on a substitution pattern
    from rdsa_utils_spark.operators.stats import price_index

    rows = [
        (0, "a", 10.0, 10.0), (0, "b", 10.0, 10.0),
        (1, "a", 20.0, 4.0), (1, "b", 11.0, 15.0),
    ]
    df = _panel(spark, rows)
    t = {
        r["period"]: r["tornqvist"]
        for r in tornqvist_index(df, "period", "item", "price", "qty", 0).collect()
    }
    lp = {
        r["period"]: (r["laspeyres"], r["paasche"])
        for r in price_index(df, "period", "item", "price", "qty", 0).collect()
    }
    lo, hi = sorted(lp[1])
    assert lo <= t[1] <= hi


def test_tornqvist_unmatched_items_excluded(spark):
    rows = [
        (0, "a", 10.0, 1.0),
        (1, "a", 11.0, 1.0), (1, "new", 99.0, 9.0),
    ]
    out = {
        r["period"]: r
        for r in tornqvist_index(
            _panel(spark, rows), "period", "item", "price", "qty", 0,
        ).collect()
    }
    assert out[1]["n_items"] == 1  # 'new' never prices in


# --------------------------------------------------------------- neyman


def test_neyman_allocates_by_size_times_spread(spark):
    # stratum A: large and variable; B: same size, constant -> all of
    # the budget goes to A
    rows = [("A", float(i), i) for i in range(100)] + [
        ("B", 5.0, 1000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    alloc, sample = neyman_sample(df, "g", "v", "id", 40)
    a = {r["stratum"]: r for r in alloc.collect()}
    assert a["A"]["n_alloc"] == 40 and a["B"]["n_alloc"] == 0
    assert a["B"]["stddev"] == 0.0
    got = sample.groupBy("g").count().collect()
    assert {r["g"]: r["count"] for r in got} == {"A": 40}


def test_neyman_exact_n_and_deterministic(spark):
    rows = [("A", float(i % 7), i) for i in range(50)] + [
        ("B", float((i * 3) % 11), 100 + i) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    alloc, s1 = neyman_sample(df, "g", "v", "id", 20)
    ids1 = sorted(r["id"] for r in s1.collect())
    _, s2 = neyman_sample(df, "g", "v", "id", 20)
    assert sorted(r["id"] for r in s2.collect()) == ids1  # reproducible
    per = {r["stratum"]: r["n_alloc"] for r in alloc.collect()}
    drawn = {
        r["g"]: r["count"] for r in s1.groupBy("g").count().collect()
    }
    assert drawn == {k: v for k, v in per.items() if v > 0}  # exact n_h
    # stddev from decimal moments equals numpy's sample stddev
    import numpy as np

    va = np.std([i % 7 for i in range(50)], ddof=1)
    a = {r["stratum"]: r["stddev"] for r in alloc.collect()}
    assert a["A"] == pytest.approx(round(va, 6), abs=1e-6)


def test_neyman_all_constant_falls_back_proportional(spark):
    rows = [("A", 1.0, i) for i in range(30)] + [
        ("B", 2.0, 100 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    alloc, _ = neyman_sample(df, "g", "v", "id", 8)
    a = {r["stratum"]: r["n_alloc"] for r in alloc.collect()}
    assert a == {"A": 6, "B": 2}  # proportional to N_h
    with pytest.raises(ValueError, match="total_n"):
        neyman_sample(df, "g", "v", "id", 0)
