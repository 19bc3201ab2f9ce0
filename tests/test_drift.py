"""operators/drift.py — KS / PSI / chi-squared drift tests against
hand-computed and numpy-replayed expectations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.drift import chi2_homogeneity, ks_2sample, psi


# --------------------------------------------------------------------------
# ks_2sample
# --------------------------------------------------------------------------


def test_ks_hand_computed(spark):
    # A = {1,2,3}, B = {2,3,4}: D = 1/3 (at v=1, 2 and 3 alike).
    rows = [(1, True), (2, True), (3, True), (2, False), (3, False), (4, False)]
    df = spark.createDataFrame(rows, ["v", "s"])
    out = ks_2sample(df, "v", "s").collect()
    assert len(out) == 1
    assert (out[0].n_a, out[0].n_b) == (3, 3)
    assert out[0].ks == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_ks_identical_samples_zero_and_disjoint_one(spark):
    same = spark.createDataFrame(
        [(v, s) for v in (1, 2, 3, 4) for s in (True, False)], ["v", "s"],
    )
    assert ks_2sample(same, "v", "s").collect()[0].ks == 0.0
    disjoint = spark.createDataFrame(
        [(1, True), (2, True), (10, False), (11, False)], ["v", "s"],
    )
    assert ks_2sample(disjoint, "v", "s").collect()[0].ks == 1.0


def test_ks_empty_side_is_null_and_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, True), (2, True), (None, False)], ["v", "s"],
    )
    row = ks_2sample(df, "v", "s").collect()[0]
    assert row.n_b == 0 and row.ks is None


def test_ks_matches_numpy_ecdf(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.randint(0, 40, 300)
    b = rng.randint(5, 45, 200)
    rows = [(int(v), True) for v in a] + [(int(v), False) for v in b]
    df = spark.createDataFrame(rows, ["v", "s"])
    got = ks_2sample(df, "v", "s").collect()[0].ks
    grid = np.arange(0, 46)
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    want = float(np.max(np.abs(fa - fb)))
    assert got == pytest.approx(want, abs=1e-6)


def test_ks_grouped(spark):
    rows = [("g1", 1, True), ("g1", 2, False), ("g2", 5, True), ("g2", 5, False)]
    df = spark.createDataFrame(rows, ["g", "v", "s"])
    out = {r.g: r.ks for r in ks_2sample(df, "v", "s", by=["g"]).collect()}
    assert out["g1"] == 1.0 and out["g2"] == 0.0


# --------------------------------------------------------------------------
# psi
# --------------------------------------------------------------------------


def _psi_expected(cnt_a, cnt_b, n_bins, smoothing=0.5):
    na, nb = sum(cnt_a), sum(cnt_b)
    tot = 0.0
    for a, b in zip(cnt_a, cnt_b):
        pa = (a + smoothing) / (na + smoothing * n_bins)
        pb = (b + smoothing) / (nb + smoothing * n_bins)
        tot += round((pb - pa) * math.log(pb / pa), 9)
    return round(tot, 6)


def test_psi_hand_computed(spark):
    # 4 bins over [0, 4): A uniform-ish, B shifted right.
    a_vals = [0.5, 1.5, 2.5, 3.5, 0.5, 1.5]
    b_vals = [2.5, 3.5, 3.5, 2.5]
    rows = [(v, True) for v in a_vals] + [(v, False) for v in b_vals]
    df = spark.createDataFrame(rows, ["v", "s"])
    out = psi(df, "v", "s", n_bins=4, lo=0.0, hi=4.0).collect()[0]
    # Occupied-bin counts (bins 0..3): A = [2,2,1,1]; B = [0,0,2,2].
    want = _psi_expected([2, 2, 1, 1], [0, 0, 2, 2], 4)
    assert (out.n_a, out.n_b) == (6, 4)
    assert out.psi == pytest.approx(want, abs=1e-6)


def test_psi_identical_distributions_near_zero(spark):
    rows = [(float(i % 10), s) for i in range(100) for s in (True, False)]
    df = spark.createDataFrame(rows, ["v", "s"])
    out = psi(df, "v", "s", n_bins=10, lo=0.0, hi=10.0).collect()[0]
    assert abs(out.psi) < 1e-9


def test_psi_clamps_out_of_range_and_validates(spark):
    # Values beyond [lo, hi) land in the edge bins, not dropped.
    rows = [(-5.0, True), (99.0, True), (0.5, False), (1.5, False)]
    df = spark.createDataFrame(rows, ["v", "s"])
    out = psi(df, "v", "s", n_bins=2, lo=0.0, hi=2.0).collect()[0]
    assert (out.n_a, out.n_b) == (2, 2)
    want = _psi_expected([1, 1], [1, 1], 2)
    assert out.psi == pytest.approx(want, abs=1e-6)
    with pytest.raises(ValueError):
        psi(df, "v", "s", n_bins=1, lo=0.0, hi=2.0)
    with pytest.raises(ValueError):
        psi(df, "v", "s", n_bins=4, lo=2.0, hi=2.0)


# --------------------------------------------------------------------------
# chi2_homogeneity
# --------------------------------------------------------------------------


def test_chi2_hand_computed_2x2(spark):
    # Table: A = [30 x, 10 y], B = [20 x, 40 y].
    rows = (
        [("x", True)] * 30 + [("y", True)] * 10
        + [("x", False)] * 20 + [("y", False)] * 40
    )
    df = spark.createDataFrame(rows, ["c", "s"])
    out = chi2_homogeneity(df, "c", "s").collect()[0]
    # chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    n, a, b, c, d = 100, 30, 10, 20, 40
    want = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert (out.n_a, out.n_b, out.dof) == (40, 60, 1)
    assert out.chi2 == pytest.approx(want, abs=1e-5)


def test_chi2_identical_mix_zero(spark):
    rows = [(c, s) for c in ("x", "y", "z") for s in (True, False) for _ in range(7)]
    df = spark.createDataFrame(rows, ["c", "s"])
    out = chi2_homogeneity(df, "c", "s").collect()[0]
    assert out.chi2 == 0.0 and out.dof == 2


def test_chi2_category_absent_from_one_sample(spark):
    # Category only in B: finite contribution, no NaN/inf.
    rows = [("x", True)] * 5 + [("x", False)] * 5 + [("y", False)] * 5
    df = spark.createDataFrame(rows, ["c", "s"])
    out = chi2_homogeneity(df, "c", "s").collect()[0]
    assert out.dof == 1
    assert out.chi2 is not None and math.isfinite(out.chi2)
    # scipy-free check: observed rows A=[5 x, 0 y], B=[5 x, 5 y];
    # expected E[s,c] = n_s * m_c / n with n=15, n_a=5, n_b=10,
    # m_x=10, m_y=5.
    obs = {("A", "x"): 5, ("A", "y"): 0, ("B", "x"): 5, ("B", "y"): 5}
    n_s = {"A": 5, "B": 10}
    m_c = {"x": 10, "y": 5}
    want = sum(
        (obs[s, c] - n_s[s] * m_c[c] / 15) ** 2 / (n_s[s] * m_c[c] / 15)
        for s in ("A", "B")
        for c in ("x", "y")
    )
    assert out.chi2 == pytest.approx(want, abs=1e-5)


def test_chi2_grouped_and_empty_sample(spark):
    rows = [("g1", "x", True), ("g1", "y", True), ("g2", "x", True), ("g2", "y", True)]
    rows += [("g1", "x", False), ("g1", "y", False)]
    df = spark.createDataFrame(rows, ["g", "c", "s"])
    out = {r.g: r for r in chi2_homogeneity(df, "c", "s", by=["g"]).collect()}
    assert out["g1"].chi2 == 0.0
    # g2 has an empty B sample: every B term is gated off -> chi2 = 0,
    # and the n_b column exposes the degeneracy to the caller.
    assert out["g2"].n_b == 0 and out["g2"].chi2 == 0.0


# --------------------------------------------------------------------------
# psi_from_counts / grid completion
# --------------------------------------------------------------------------


def test_psi_from_counts_matches_psi(spark):
    from rdsa_utils_spark.operators.drift import fixed_bin, psi_from_counts

    rows = [(float(v), v % 3 == 0) for v in range(60)]
    df = spark.createDataFrame(rows, ["v", "s"])
    direct = psi(df, "v", "s", n_bins=6, lo=0.0, hi=60.0).collect()[0]
    counts = (
        df.groupBy(fixed_bin("v", 6, 0.0, 60.0).alias("bin"))
        .agg(
            F.sum(F.when(F.col("s"), 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("s"), 0).otherwise(1)).alias("b"),
        )
    )
    via_counts = psi_from_counts(counts, "bin", "a", "b", 6).collect()[0]
    assert (direct.n_a, direct.n_b, direct.psi) == (
        via_counts.n_a, via_counts.n_b, via_counts.psi,
    )


def test_psi_grid_completion_counts_empty_bins(spark):
    """A bin empty in BOTH samples still carries its smoothing term
    when the sample sizes differ — the full-grid definition."""
    from rdsa_utils_spark.operators.drift import psi_from_counts

    # bins 0,1 occupied; bins 2,3 fully absent; n_a=30 != n_b=3.
    counts = spark.createDataFrame(
        [(0, 20, 2), (1, 10, 1)], ["bin", "a", "b"],
    )
    got = psi_from_counts(counts, "bin", "a", "b", 4).collect()[0]
    want = _psi_expected([20, 10, 0, 0], [2, 1, 0, 0], 4)
    assert got.psi == pytest.approx(want, abs=1e-6)
    # Without the (0,0) bins the sum would differ:
    partial = _psi_expected([20, 10], [2, 1], 4)
    assert abs(want - partial) > 1e-9


# --------------------------------------------------------------------------
# streaming drift: windowed bin counts + PSI vs reference
# --------------------------------------------------------------------------


def test_psi_vs_reference_hand_computed(spark):
    from rdsa_utils_spark.streaming.drift import psi_vs_reference

    ref = spark.createDataFrame(
        [(0, 6), (1, 2)], ["bin", "n_ref"],
    )
    wc = spark.createDataFrame(
        [("w1", "x", 0, 3), ("w1", "x", 1, 1),   # same mix as reference
         ("w2", "x", 1, 4)],                      # all mass moved to bin 1
        ["window_start", "window_end", "bin", "n"],
    )
    out = {
        r.window_start: r
        for r in psi_vs_reference(wc, ref, n_bins=2).collect()
    }
    assert out["w1"].n_a == 8 and out["w1"].n_b == 4
    w1 = _psi_expected([6, 2], [3, 1], 2)
    assert out["w1"].psi == pytest.approx(w1, abs=1e-6)
    w2 = _psi_expected([6, 2], [0, 4], 2)
    assert out["w2"].psi == pytest.approx(w2, abs=1e-6)
    assert out["w2"].psi > out["w1"].psi


def test_windowed_bin_counts_batch_matches_reference_grid(spark):
    from rdsa_utils_spark.streaming.drift import (
        reference_bin_counts,
        windowed_bin_counts,
    )

    rows = [("2024-01-01 00:%02d:00" % m, float(m)) for m in range(40)]
    df = spark.createDataFrame(rows, ["ts_s", "v"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "v",
    )
    wc = windowed_bin_counts(df, "ts", "1 hour", "v", n_bins=4, lo=0.0, hi=40.0)
    got = {(r.bin): r.n for r in wc.collect()}
    assert got == {0: 10, 1: 10, 2: 10, 3: 10}
    ref = reference_bin_counts(df, "v", 4, 0.0, 40.0)
    assert {r.bin: r.n_ref for r in ref.collect()} == got
