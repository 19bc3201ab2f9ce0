"""Unit tests for operators/spatial.py — known-distance fixtures and
brute-force equivalence; the corpus-scale path is oracle-checked in
test_extra_oracles.py (nearby_customers)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.spatial import haversine_km, radius_self_join


def test_haversine_known_distances(spark):
    # London (51.5074, -0.1278) to Paris (48.8566, 2.3522) ≈ 343.5 km.
    df = spark.createDataFrame(
        [(51.5074, -0.1278, 48.8566, 2.3522)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    d = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
    ).collect()[0].d
    assert d == pytest.approx(343.5, abs=1.0)
    # Zero distance to self.
    z = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")).alias("d"),
    ).collect()[0].d
    assert z == 0.0


def test_radius_self_join_matches_brute_force(spark):
    # Cluster of points straddling grid-cell boundaries plus isolates.
    pts = [
        (1, 10.0, 20.0),
        (2, 10.01, 20.01),     # ~1.6 km from 1
        (3, 10.04, 20.0),      # ~4.4 km from 1 (inside 5 km)
        (4, 10.1, 20.1),       # ~15 km away
        (5, -30.0, 150.0),     # far isolate
        (6, 10.0, 19.96),      # ~4.4 km west of 1, different lon cell
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = sorted((r.id_a, r.id_b) for r in
                 radius_self_join(df, "id", "lat", "lon", 5.0).collect())

    def hv(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[1], a[2], b[1], b[2]))
        x = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
        return 2 * 6371.0088 * math.asin(math.sqrt(x))

    brute = sorted(
        (a[0], b[0])
        for i, a in enumerate(pts) for b in pts[i + 1:]
        if round(hv(a, b), 6) <= 5.0
    )
    assert out == brute and len(out) >= 3


def test_radius_self_join_validation_and_lat_guard(spark):
    df = spark.createDataFrame(
        [(1, 75.0, 0.0), (2, 75.001, 0.0)], "id long, lat double, lon double",
    )
    # Points beyond max_abs_lat are excluded from the join entirely.
    assert radius_self_join(df, "id", "lat", "lon", 5.0, max_abs_lat=60.0).count() == 0
    # Raising the guard brings them back.
    assert radius_self_join(df, "id", "lat", "lon", 5.0, max_abs_lat=80.0).count() == 1
    with pytest.raises(ValueError):
        radius_self_join(df, "id", "lat", "lon", -1.0)
    with pytest.raises(ValueError):
        radius_self_join(df, "id", "lat", "lon", 5.0, max_abs_lat=95.0)
