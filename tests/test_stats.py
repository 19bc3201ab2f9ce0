"""Unit tests for operators/stats.py and the graph extensions
(cooccurrence_pairs / triangle_count) — small hand-built frames with
independently computable answers; the corpus-scale paths are
oracle-checked in test_extra_oracles.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.graph import cooccurrence_pairs, triangle_count
from rdsa_utils_spark.operators.stats import (
    chi_square_drift,
    correlation_matrix,
    grouped_linear_fit,
    rfm_segments,
    winsorize,
)


def test_grouped_linear_fit_exact_line(spark):
    # y = 2x + 1 exactly in group 'a'; constant x in group 'b' -> NULLs.
    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(5)]
    rows += [("b", 3.0, float(y)) for y in range(4)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_linear_fit(df, "x", "y", ["g"]).collect()}
    assert out["a"].n == 5
    assert out["a"].slope == pytest.approx(2.0)
    assert out["a"].intercept == pytest.approx(1.0)
    assert out["a"].r2 == pytest.approx(1.0)
    assert out["b"].slope is None and out["b"].r2 is None


def test_correlation_matrix_signs_and_pairs(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.5, -3.9)],
        "a double, b double, c double",
    )
    out = {(r.col_x, r.col_y): r.corr for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] > 0.99
    assert out[("a", "c")] < -0.99
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])


def test_chi_square_drift_identical_distributions_zero(spark):
    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "c string")
    b = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "c string")
    out = chi_square_drift(a, b, "c").collect()
    # Same x:y mix in both samples -> expected == observed, contrib 0.
    assert all(r.chi2_contrib == 0.0 for r in out)
    total = sum(r.n_a + r.n_b for r in out)
    assert total == 15


def test_chi_square_drift_statistic_matches_hand_calc(spark):
    # 2x2: a = 8 x / 2 y, b = 2 x / 8 y.
    a = spark.createDataFrame([("x",)] * 8 + [("y",)] * 2, "c string")
    b = spark.createDataFrame([("x",)] * 2 + [("y",)] * 8, "c string")
    out = {r.category: r for r in chi_square_drift(a, b, "c").collect()}
    # For category x: row_total 10, expected 5/5 -> (8-5)^2/5 + (2-5)^2/5 = 3.6
    assert out["x"].chi2_contrib == pytest.approx(3.6)
    assert out["y"].chi2_contrib == pytest.approx(3.6)
    stat = sum(r.chi2_contrib for r in out.values())
    assert stat == pytest.approx(7.2)


def test_winsorize_clips_only_outliers_and_keeps_nulls(spark):
    vals = [float(v) for v in range(1, 21)]  # 1..20
    rows = [("g", v) for v in vals] + [("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], lower=0.05, upper=0.95)
    got = [r.v_winsorized for r in out.collect()]
    # Exact interpolated bounds for 1..20 at (n-1)p: lo=1.95, hi=19.05.
    assert min(x for x in got if x is not None) == pytest.approx(1.95)
    assert max(x for x in got if x is not None) == pytest.approx(19.05)
    assert sum(1 for x in got if x is None) == 1  # NULL passes through
    # Interior values untouched.
    assert 10.0 in got
    with pytest.raises(ValueError):
        winsorize(df, "v", ["g"], lower=0.9, upper=0.1)


def test_rfm_segments_scores_and_label(spark):
    rows = []
    # 4 customers with strictly increasing frequency/monetary/recency.
    for cust, n in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for i in range(n):
            rows.append((cust, f"2024-0{cust}-0{i+1} 00:00:00", 100.0 * cust))
    df = spark.createDataFrame(rows, "cust long, d string, amt double").withColumn(
        "d", F.col("d").cast("timestamp"),
    )
    out = {r.customer: r for r in rfm_segments(df, "cust", "d", "amt").collect()}
    assert [out[c].f_score for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[c].m_score for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[c].r_score for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[4].segment == "444"
    assert out[1].segment == "111"


def test_cooccurrence_pairs_counts_and_cap(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate item in basket
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r.n_baskets
           for r in cooccurrence_pairs(df, "basket", "item").collect()}
    assert out[("a", "b")] == 3  # dup (3,b) counted once
    assert out[("a", "c")] == 1 and out[("b", "c")] == 1
    capped = cooccurrence_pairs(df, "basket", "item", max_items_per_basket=2)
    got = {(r.item_a, r.item_b): r.n_baskets for r in capped.collect()}
    # Basket 1 keeps only items a, b (smallest-first deterministic cap).
    assert ("a", "c") not in got and got[("a", "b")] == 3


def test_triangle_count_hand_built_graph(spark):
    # K4 minus one edge has 2 triangles; edges given in mixed order
    # with duplicates and a self-loop to exercise canonicalization.
    edges = [
        (1, 2), (2, 3), (3, 1), (1, 4), (4, 2),
        (2, 1),  # reverse duplicate
        (3, 3),  # self-loop
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0].n_triangles == 2
    empty = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert triangle_count(empty).collect()[0].n_triangles == 0


def test_boilerplate_ngrams_flags_shared_tokens(spark):
    from rdsa_utils_spark.operators.text import boilerplate_ngrams

    docs = spark.createDataFrame(
        [
            (1, "common alpha unique1"),
            (2, "common alpha unique2"),
            (3, "common beta unique3"),
            (4, "common beta unique4"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           boilerplate_ngrams(docs, "text", "doc_id", shingle_n=1,
                              max_doc_frac=0.5).collect()}
    # 'common' in 4/5 docs (0.8 > 0.5) -> boilerplate; 'alpha'/'beta'
    # in 2/5 (0.4) -> not.
    assert out[1].n_shingles == 3 and out[1].n_boilerplate == 1
    assert out[1].boilerplate_ratio == pytest.approx(1 / 3, abs=1e-6)
    assert out[5].n_shingles == 0 and out[5].boilerplate_ratio is None
    with pytest.raises(ValueError):
        boilerplate_ngrams(docs, "text", "doc_id", max_doc_frac=0.0)
