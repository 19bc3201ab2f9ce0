"""Round-10 self-review guards on the scaled-long fast paths: the
long→double cast is exact only below 2^53, so both the scoring fold
(`logreg_score_expr`) and the per-iteration training fold
(`train_logreg_hashed`) must fall back to the decimal contract when
the worst-case scaled weight sum crosses it — and the fallback must
produce the SAME contract values. A model/feature-space size mismatch
must fail loudly instead of silently desyncing hash buckets."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def _contract_prob(wmap, buckets, prob_round=6):
    """The documented contract, in pure Python: 12-dp quantized terms
    summed exactly, then sigmoid, rounded."""
    from rdsa_utils_spark.functions.quantize import dq

    dot = float(sum((dq(wmap.get(b, 0.0), 12) for b in buckets), Decimal(0)))
    z = dot + wmap.get(-1, 0.0)
    if z > 700:
        p = 1.0
    elif z < -700:
        p = 0.0
    else:
        p = 1.0 / (1.0 + math.exp(-z))
    return round(p, prob_round)


def _score(spark, wmap, n_features=8):
    from rdsa_utils_spark.operators.classify import (
        logreg_score_expr,
        presence_buckets_expr,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a"), (3, "")], "id long, text string",
    )
    rows = docs.select(
        "id",
        logreg_score_expr(wmap, "text", n_features=n_features).alias("p"),
        presence_buckets_expr("text", n_features).alias("b"),
    ).collect()
    return {r["id"]: (r["p"], list(r["b"])) for r in rows}


def test_score_expr_decimal_fallback_past_2_53(spark):
    """Scaled weight sums past 2^53 must take the decimal path and
    still honor the contract (the old max|w|<=1e4 guard admitted
    models whose SUM broke the long→double exactness)."""
    # one weight alone scales past 2^53 (5e9·1e12 = 5e21) while staying
    # well inside the decimal(25,12) contract's own |dot| < 1e13 domain
    big = 5.0e9
    wmap = {-1: 0.25, 0: big, 1: -big, 2: 0.125, 5: 1.0}
    got = _score(spark, wmap)
    for _id, (p, buckets) in got.items():
        assert p == pytest.approx(_contract_prob(wmap, buckets), abs=0)


def test_score_expr_long_path_near_the_bound(spark):
    """Just UNDER the bound the long fold runs and matches the
    contract bit-for-bit."""
    # 8 features × ~1e3 each: scaled sum ≈ 8e15 < 2^53 ≈ 9.007e15
    wmap = {-1: -0.5, **{f: 1000.0 + f * 0.000000000123 for f in range(8)}}
    got = _score(spark, wmap)
    for _id, (p, buckets) in got.items():
        assert p == pytest.approx(_contract_prob(wmap, buckets), abs=0)


def test_score_expr_refuses_feature_space_mismatch(spark):
    from rdsa_utils_spark.operators.classify import logreg_score_expr

    with pytest.raises(ValueError, match="n_features"):
        logreg_score_expr({-1: 0.0, 300: 1.0}, "text", n_features=256)


def test_train_falls_back_when_weights_cross_2_53(spark):
    """A pathological lr drives weights past the long-exactness bound
    mid-training; the per-iteration guard must switch that iteration
    to the decimal fold and keep training equal to the pure-Python
    contract replay (it silently produced off-by-ulp dots before)."""
    from rdsa_utils_spark.functions.quantize import dq, round_half_up
    from rdsa_utils_spark.operators.classify import train_logreg_hashed
    from rdsa_utils_spark.operators.classify import presence_buckets_expr

    docs = spark.createDataFrame(
        [(1, "good fresh text", 1.0), (2, "bad junk spam", 0.0),
         (3, "good text here", 1.0), (4, "spam junk bad", 0.0)],
        "id long, text string, y double",
    )
    # lr drives per-feature weights to ~1e4, so the worst-case scaled
    # sum (~16·1e4·1e12 = 1.6e17) crosses 2^53 while every dot stays
    # inside the decimal contract's domain
    n_feat, iters, lr = 16, 3, 1.0e5
    model = {
        r["feature"]: r["weight"]
        for r in train_logreg_hashed(
            docs, "y", "text", "id", n_features=n_feat,
            iterations=iters, lr=lr,
        ).collect()
    }
    # pure-Python replay of the documented contract
    rows = docs.select(
        "y", presence_buckets_expr("text", n_feat).alias("b"),
    ).collect()
    data = [(float(r["y"]), list(r["b"])) for r in rows]
    n = len(data)
    npos = sum(1 for y, _ in data if y == 1.0)
    b = round_half_up(math.log(npos / (n - npos)), 9) if 0 < npos < n else 0.0
    w = [0.0] * n_feat
    for _ in range(iters):
        g = {f: Decimal(0) for f in range(-1, n_feat)}
        for y, bs in data:
            dot = float(sum((dq(w[f], 12) for f in bs), Decimal(0)))
            z = b + dot
            p = 1.0 if z > 700 else (0.0 if z < -700 else 1.0 / (1.0 + math.exp(-z)))
            r_ = Decimal(repr(round_half_up(p - y, 12)))
            for f in bs:
                g[f] += r_
            g[-1] += r_
        for f in range(n_feat):
            w[f] = round_half_up(w[f] - lr * (float(g[f]) / n), 9)
        b = round_half_up(b - lr * (float(g[-1]) / n), 9)
    want = {-1: b, **{f: w[f] for f in range(n_feat)}}
    assert model == want
