"""Unit tests for round-7 kmeans_profile (operators/similarity.py):
per-cell cohesion over an ivf_assign partition."""

from __future__ import annotations

import numpy as np
import pytest

from rdsa_utils_spark.operators.similarity import kmeans_profile


def test_two_planted_clusters(spark):
    # Cluster 0 hugs e0, cluster 1 hugs e1; exact membership and
    # cohesion ordering are predictable.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.95, 0.05, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.1, 0.9, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = {r["cell"]: r for r in kmeans_profile(df, cents).collect()}
    assert out[0]["n"] == 3 and out[1]["n"] == 2
    # perfectly-aligned members push cohesion toward 1
    assert 0.99 <= out[0]["mean_cosine"] <= 1.0
    assert 0.99 <= out[1]["mean_cosine"] <= 1.0


def test_mean_cosine_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    cents = vecs[:4] / np.linalg.norm(vecs[:4], axis=1, keepdims=True)
    out = kmeans_profile(df, cents).collect()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cells = np.argmax(unit @ cents.T, axis=1)
    for r in out:
        members = unit[cells == r["cell"]]
        assert r["n"] == len(members)
        want = round(
            float(np.mean(np.round(members @ cents[r["cell"]], 9))), 6,
        )
        assert r["mean_cosine"] == pytest.approx(want, abs=1e-6)
    assert sum(r["n"] for r in out) == 30
