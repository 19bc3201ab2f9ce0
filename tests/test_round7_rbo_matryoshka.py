"""Unit tests for round-7 rank-biased overlap (evaluate.rbo_at_k) and
matryoshka embedding truncation (similarity.truncate_normalize)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.evaluate import rbo_at_k, rbo_depth_weights
from rdsa_utils_spark.operators.similarity import truncate_normalize


def _ranking(spark, q, docs):
    return spark.createDataFrame(
        [(q, d, r + 1) for r, d in enumerate(docs)],
        "query_id long, doc_id string, rank long",
    )


def _rbo_reference(a, b, k, p):
    """Textbook per-depth overlap form (Webber et al. eq. 4)."""
    total = 0.0
    for d in range(1, k + 1):
        overlap = len(set(a[:d]) & set(b[:d]))
        total += p ** (d - 1) * overlap / d
    return (1 - p) * total


@pytest.mark.parametrize(
    "a,b",
    [
        (list("abcde"), list("abcde")),          # identical
        (list("abcde"), list("edcba")),          # reversed
        (list("abcde"), list("fghij")),          # disjoint
        (list("abcdefgh"), list("badcfehg")),    # pairwise swaps
        (list("abc"), list("abx")),              # non-conjoint tails
    ],
)
def test_rbo_matches_per_depth_definition(spark, a, b):
    k, p = 5, 0.9
    ra, rb = _ranking(spark, 1, a), _ranking(spark, 1, b)
    got = rbo_at_k(ra, rb, k=k, p=p).collect()[0]["rbo"]
    want = _rbo_reference(a[:k], b[:k], k, p)
    assert got == pytest.approx(want, abs=1e-6)


def test_rbo_bounds_and_missing_query(spark):
    ra = _ranking(spark, 1, list("abc"))
    rb = _ranking(spark, 1, list("xyz"))
    out = rbo_at_k(ra, rb, k=3).collect()
    assert out[0]["rbo"] == 0.0  # disjoint
    same = rbo_at_k(ra, ra, k=3, p=0.5).collect()[0]["rbo"]
    # identical prefixes truncated at k: (1-p) * sum p^(d-1) * 1
    assert same == pytest.approx(0.5 * (1 + 0.5 + 0.25), abs=1e-6)
    with pytest.raises(ValueError, match="k must"):
        rbo_at_k(ra, rb, k=0)
    with pytest.raises(ValueError, match="p must"):
        rbo_at_k(ra, rb, k=3, p=1.0)


def test_rbo_depth_weights_are_suffix_sums():
    k, p = 7, 0.8
    w = rbo_depth_weights(k, p)
    for m in range(1, k + 1):
        want = sum(p ** (d - 1) / d for d in range(m, k + 1))
        assert w[m - 1] == pytest.approx(want, abs=1e-12)
    assert w == sorted(w, reverse=True)  # deeper start => less weight


def test_truncate_normalize_unit_prefix(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, -7.0])], "id long, embedding array<double>",
    )
    out = truncate_normalize(df, "embedding", 2).collect()[0]["embedding"]
    assert out == pytest.approx([0.6, 0.8])
    raw = truncate_normalize(df, "embedding", 3, normalize=False).collect()[0][
        "embedding"
    ]
    assert raw == [3.0, 4.0, 100.0]
    # zero prefix passes through instead of NaN
    z = spark.createDataFrame(
        [(1, [0.0, 0.0, 5.0])], "id long, embedding array<double>",
    )
    assert truncate_normalize(z, "embedding", 2).collect()[0]["embedding"] == [
        0.0,
        0.0,
    ]
    with pytest.raises(ValueError, match="dim"):
        truncate_normalize(df, "embedding", 0)


def test_truncation_preserves_prefix_cosine(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(6, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(6)],
        "id long, embedding array<double>",
    )
    got = {
        r["id"]: r["embedding"]
        for r in truncate_normalize(df, "embedding", 4).collect()
    }
    for i in range(6):
        pref = vecs[i][:4] / np.linalg.norm(vecs[i][:4])
        assert got[i] == pytest.approx(list(pref), abs=1e-12)
        assert math.isclose(sum(x * x for x in got[i]), 1.0, abs_tol=1e-12)
