"""Spatial operators: haversine distance and grid-bucketed radius
joins — dependency-free (pure Catalyst math, no geo libraries).

Extension surface (no reference equivalent): proximity queries are
the spatial version of the engine's range join, and they scale the
same way — bucket both sides into grid cells sized by the search
radius, explode each probe row into its 3×3 neighbor cells, and
equi-join ON the cell key so candidate generation is linear in data
volume; the exact haversine predicate then filters candidates. No
cartesian product at any scale, the same candidate-generation
discipline as the LSH/banding dedup operators.

Determinism note: ``sin``/``cos``/``asin`` may differ by 1 ulp
between math libraries, so distances are rounded (default 6 dp ≈
millimetres) before output and before the radius comparison — the
pair set is then replayable on an external engine except for points
sitting within ~1e-6 km of the exact radius.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "radius_self_join", "EARTH_RADIUS_KM"]

EARTH_RADIUS_KM = 6371.0088

#: Kilometres per degree of latitude (and of longitude at the
#: equator) — the grid sizing constant.
_KM_PER_DEG = 111.0


def haversine_km(
    lat1: Column,
    lon1: Column,
    lat2: Column,
    lon2: Column,
) -> Column:
    """Great-circle distance in kilometres (haversine formula,
    double precision, WGS84 mean radius)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def radius_self_join(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 60.0,
    round_to: int = 6,
) -> DataFrame:
    """All point pairs within ``radius_km`` of each other:
    ``(id_a, id_b, distance_km)`` with ``id_a < id_b``.

    Grid cells are ``radius_km`` degrees of latitude tall and
    ``radius_km / cos(max_abs_lat)`` degrees of longitude wide, so a
    3×3 neighborhood is guaranteed to cover the radius for any point
    with ``|lat| <= max_abs_lat`` (validated — polar data needs a
    polar-cap strategy, not a lon/lat grid). The left side explodes
    ×9 into its neighbor cells, the right side keeps its own cell,
    and the join is a hash equi-join on (cx, cy): linear shuffle,
    well-distributed keys, no cartesian. Exact haversine (rounded)
    filters the candidates.
    """
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not 0 < max_abs_lat < 90:
        raise ValueError(f"max_abs_lat must be in (0, 90), got {max_abs_lat}")
    import math

    cell_lat = radius_km / _KM_PER_DEG
    cell_lon = radius_km / (_KM_PER_DEG * math.cos(math.radians(max_abs_lat)))

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
    ).filter(F.abs(F.col("__lat")) <= F.lit(float(max_abs_lat)))
    cx = F.floor(F.col("__lon") / F.lit(cell_lon)).cast("long")
    cy = F.floor(F.col("__lat") / F.lit(cell_lat)).cast("long")

    offsets = F.expr(
        "array(-1,0,1)",
    )
    left = (
        base.withColumn("__cx0", cx)
        .withColumn("__cy0", cy)
        .withColumn("__dx", F.explode(offsets))
        .withColumn("__dy", F.explode(offsets))
        .select(
            F.col("__id").alias("id_a"),
            F.col("__lat").alias("lat_a"),
            F.col("__lon").alias("lon_a"),
            (F.col("__cx0") + F.col("__dx")).alias("cx"),
            (F.col("__cy0") + F.col("__dy")).alias("cy"),
        )
    )
    right = base.select(
        F.col("__id").alias("id_b"),
        F.col("__lat").alias("lat_b"),
        F.col("__lon").alias("lon_b"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    dist = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"),
        ),
        round_to,
    )
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= F.lit(float(radius_km)))
        .select("id_a", "id_b", "distance_km")
    )
