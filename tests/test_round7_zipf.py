"""Unit tests for round-7 zipf_fit (operators/text.py)."""

from __future__ import annotations

import math

import pytest

from rdsa_utils_spark.operators.text import zipf_fit


def test_exact_power_law_recovers_slope(spark):
    # freq(rank) = round(1000 * rank^-1): near-perfect Zipf input
    rows = []
    for r in range(1, 21):
        freq = max(1, round(1000 / r))
        rows += [(f"t{r:02d} " * freq).strip().split()]
    docs = spark.createDataFrame(
        [(" ".join(sum(rows, [])),)], "text string",
    )
    out = zipf_fit(docs, "text", top_k=20).collect()[0]
    assert out["n_terms"] == 20
    assert out["slope"] == pytest.approx(-1.0, abs=0.02)
    assert out["r2"] > 0.999


def test_matches_numpy_polyfit(spark):
    import numpy as np

    freqs = [90, 70, 50, 30, 20, 12, 7, 4, 3, 2]
    text = " ".join(
        " ".join([f"w{i}"] * f) for i, f in enumerate(freqs)
    )
    docs = spark.createDataFrame([(text,)], "text string")
    out = zipf_fit(docs, "text", top_k=10).collect()[0]
    x = np.log(np.arange(1, 11))
    y = np.log(np.array(sorted(freqs, reverse=True), dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert out["slope"] == pytest.approx(slope, abs=1e-4)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-4)
    r = np.corrcoef(x, y)[0, 1]
    assert out["r2"] == pytest.approx(r * r, abs=1e-4)


def test_constant_frequencies_have_null_r2(spark):
    docs = spark.createDataFrame([("a b c a b c",)], "text string")
    out = zipf_fit(docs, "text", top_k=3).collect()[0]
    assert out["r2"] is None  # zero y-variance: correlation undefined
    assert out["slope"] == 0.0
    with pytest.raises(ValueError, match="top_k"):
        zipf_fit(docs, "text", top_k=1)
