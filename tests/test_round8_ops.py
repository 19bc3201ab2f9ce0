"""Unit/property tests for the round-8 operators: the pairwise
win-rate significance matrix (operators/preference.win_rate_matrix)
and DoReMi-style mixture reweighting (operators/curation.
doremi_reweight)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.curation import doremi_reweight
from rdsa_utils_spark.operators.preference import _norm_ppf, win_rate_matrix

SCHEMA = "winner string, loser string"


def _games(spark, a_wins, b_wins, a="A", b="B"):
    rows = [(a, b)] * a_wins + [(b, a)] * b_wins
    return spark.createDataFrame(rows, SCHEMA)


def test_norm_ppf_known_quantiles():
    assert _norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-8)
    assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-12)
    assert _norm_ppf(0.995) == pytest.approx(2.575829304, abs=1e-8)
    assert _norm_ppf(0.025) == pytest.approx(-1.959963985, abs=1e-8)


def test_win_rate_wilson_known_fixture(spark):
    # n=10, 5 wins, z=1.96: the textbook Wilson interval (.2366, .7634)
    out = win_rate_matrix(_games(spark, 5, 5), "winner", "loser",
                          m_tests=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n"], r["wins_a"]) == ("A", "B", 10, 5)
    assert r["win_rate"] == pytest.approx(0.5)
    assert r["ci_lo"] == pytest.approx(0.2366, abs=1e-4)
    assert r["ci_hi"] == pytest.approx(0.7634, abs=1e-4)
    assert r["significant"] is False


def test_win_rate_significance_flag(spark):
    strong = win_rate_matrix(
        _games(spark, 19, 1), "winner", "loser", m_tests=1,
    ).collect()[0]
    assert strong["significant"] is True and strong["ci_lo"] > 0.5
    weak = win_rate_matrix(
        _games(spark, 12, 8), "winner", "loser", m_tests=1,
    ).collect()[0]
    assert weak["significant"] is False


def test_win_rate_symmetry_under_outcome_flip(spark):
    df = _games(spark, 13, 4)
    fwd = win_rate_matrix(df, "winner", "loser", m_tests=1).collect()[0]
    rev = win_rate_matrix(df, "loser", "winner", m_tests=1).collect()[0]
    # flipping every outcome mirrors the rate and the interval
    assert rev["win_rate"] == pytest.approx(1.0 - fwd["win_rate"])
    assert rev["ci_lo"] == pytest.approx(1.0 - fwd["ci_hi"], abs=2e-6)
    assert rev["ci_hi"] == pytest.approx(1.0 - fwd["ci_lo"], abs=2e-6)
    assert rev["significant"] == fwd["significant"]


def test_win_rate_bonferroni_widens(spark):
    df = _games(spark, 30, 10)
    one = win_rate_matrix(df, "winner", "loser", m_tests=1).collect()[0]
    many = win_rate_matrix(df, "winner", "loser", m_tests=45).collect()[0]
    assert many["ci_lo"] < one["ci_lo"] and many["ci_hi"] > one["ci_hi"]


def test_win_rate_counts_pairs_for_default_bonferroni(spark):
    df = spark.createDataFrame(
        [("A", "B")] * 10 + [("A", "C")] * 10 + [("B", "C")] * 10, SCHEMA,
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in win_rate_matrix(df, "winner", "loser").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    # default m = 3 observed pairs == explicit m_tests=3
    explicit = win_rate_matrix(df, "winner", "loser", m_tests=3).collect()
    assert sorted(map(tuple, explicit)) == sorted(
        tuple(r) for r in out.values()
    )


def test_win_rate_excludes_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [("A", "B"), ("A", "A"), (None, "B"), ("B", None)], SCHEMA,
    )
    out = win_rate_matrix(df, "winner", "loser", m_tests=1).collect()
    assert len(out) == 1 and out[0]["n"] == 1


DOM_SCHEMA = "domain string, loss double"


def test_doremi_uniform_losses_stay_uniform(spark):
    df = spark.createDataFrame(
        [(d, 2.5) for d in "abc" for _ in range(7)], DOM_SCHEMA,
    )
    out = doremi_reweight(df, "domain", "loss", steps=5).collect()
    assert [r["weight"] for r in out] == pytest.approx([1 / 3] * 3)


def test_doremi_driver_path_equals_distributed(spark):
    # round-12: the domain-cardinality step loop collapses to a
    # driver replay below max_driver_domains; the two paths must be
    # BIT-identical (every quantization half-up, every reduction an
    # exact decimal sum — the operator's replay contract)
    import random

    rng = random.Random(4242)
    rows = [
        (d, round(rng.uniform(0.2, 6.0), 3))
        for d in ["news", "web", "code", "forums", "papers"]
        for _ in range(rng.randint(5, 60))
    ]
    df = spark.createDataFrame(rows, DOM_SCHEMA).repartition(5)
    fast = doremi_reweight(df, "domain", "loss", steps=7, eta=0.4).collect()
    slow = doremi_reweight(
        df, "domain", "loss", steps=7, eta=0.4, max_driver_domains=0,
    ).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


def test_doremi_upweights_high_loss_domains(spark):
    # mid must START above the uniform mixture mean ((1+3+4)/3 = 2.67)
    # or the max(0, excess) clamp freezes it alongside easy
    rows = (
        [("easy", 1.0)] * 50 + [("mid", 3.0)] * 30 + [("hard", 4.0)] * 20
    )
    df = spark.createDataFrame(rows, DOM_SCHEMA)
    out = {r["domain"]: r for r in
           doremi_reweight(df, "domain", "loss").collect()}
    assert out["hard"]["weight"] > out["mid"]["weight"] > out["easy"]["weight"]
    assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)
    assert out["easy"]["n"] == 50 and out["hard"]["mean_loss"] == 4.0


def test_doremi_matches_pure_python_replay(spark):
    import random

    rng = random.Random(88)
    domains = ["news", "web", "code", "forums"]
    rows = [
        (d, round(rng.uniform(0.5, 5.0), 3))
        for d in domains
        for _ in range(40)
    ]
    df = spark.createDataFrame(rows, DOM_SCHEMA).repartition(7)
    steps, eta = 6, 0.5
    got = {
        r["domain"]: r["weight"]
        for r in doremi_reweight(df, "domain", "loss",
                                 steps=steps, eta=eta).collect()
    }

    # exact replay with the same quantization schedule
    from collections import defaultdict
    from decimal import Decimal

    sums, counts = defaultdict(Decimal), defaultdict(int)
    for d, v in rows:
        sums[d] += Decimal(str(round(v, 6))).quantize(Decimal("1e-12"))
        counts[d] += 1
    mean = {d: round(float(sums[d]) / counts[d], 6) for d in domains}
    k = len(domains)
    w = {d: round(1.0 / k, 9) for d in domains}
    wsum = {d: 0.0 for d in domains}
    for _ in range(steps):
        mix = float(sum(
            Decimal(str(round(w[d] * mean[d], 12))) for d in domains
        ))
        raw = {
            d: round(w[d] * math.exp(eta * max(0.0, mean[d] - mix)), 12)
            for d in domains
        }
        tot = float(sum(Decimal(str(raw[d])) for d in domains))
        w = {d: round(raw[d] / tot, 9) for d in domains}
        for d in domains:
            wsum[d] += w[d]
    want = {d: round(wsum[d] / steps, 6) for d in domains}
    assert got == pytest.approx(want, abs=1e-9)


def test_doremi_validates_inputs(spark):
    df = spark.createDataFrame([("a", 1.0)], DOM_SCHEMA)
    with pytest.raises(ValueError, match="steps"):
        doremi_reweight(df, "domain", "loss", steps=0)
    with pytest.raises(ValueError, match="eta"):
        doremi_reweight(df, "domain", "loss", eta=0.0)
    empty = spark.createDataFrame([(None, 1.0)], DOM_SCHEMA)
    with pytest.raises(ValueError, match="no non-null"):
        doremi_reweight(empty, "domain", "loss")
