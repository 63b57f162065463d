"""Spatial operators: grid-bucketed radius join with haversine verify.

The reference geocodes parcels and serves them on a lat/lon map
(acreage pipeline -> Leaflet); the scale-side operation that backs
"what's within R meters of X" at 100 TB is a GRID-BUCKETED radius
join: snap every point to an equirectangular cell of size >= R, join
candidates cell-to-cell over the query point's 3x3 cell neighborhood
(a constant fanout equi-join Catalyst can hash — never a cross join
with a distance predicate, which plans BroadcastNestedLoopJoin), then
verify the exact great-circle distance on candidates only.

All math is plain double trig (sin/cos/asin) evaluated identically by
any engine; distances round to whole meters before the radius compare
(the repo's cross-engine float rule).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine; doubles only)."""
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1 * F.lit(rad))
        * F.cos(lat2 * F.lit(rad))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def radius_join(
    points: DataFrame,
    queries: DataFrame,
    radius_m: float,
    point_cols: tuple[str, str] = ("lat", "lon"),
    query_cols: tuple[str, str] = ("q_lat", "q_lon"),
) -> DataFrame:
    """All (query, point) pairs within ``radius_m`` meters.

    Returns queries' columns + points' columns + ``distance_m``
    (rounded to whole meters; the radius compare runs on the rounded
    value so both engines make the identical cut).

    Grid cells are ``radius_m`` tall; the longitude width is scaled by
    cos(60 deg) so cells stay >= radius wide up to |lat| <= 60 (beyond
    that, widen the cap or use a polar-aware scheme). The validity
    limits are ENFORCED, not just documented: a row with |lat| > 60,
    or a longitude within one cell width of the +-180 antimeridian
    (where the grid does not wrap), raises at execution time via an
    inline guard on the cell expression — out-of-contract inputs fail
    loudly instead of silently losing matches. Each point lands in ONE
    cell; each query probes its 3x3 neighborhood via a 9-element
    explode — constant fanout on the (usually smaller) query side,
    single equi-join on the cell key.
    """
    if radius_m <= 0:
        raise ValueError(f"radius_join: radius_m must be > 0, got {radius_m}")
    plat, plon = point_cols
    qlat, qlon = query_cols
    lat_step = radius_m / 111_320.0  # meters per degree latitude
    lon_step = lat_step / 0.5  # cos(60 deg) safety floor
    if lon_step > 90.0:
        raise ValueError(
            f"radius_join: radius_m={radius_m} implies {lon_step:.1f}-degree "
            "grid cells — too coarse for a non-wrapping equirectangular "
            "grid; use a smaller radius or a polar/wrap-aware scheme"
        )

    def _checked(col: Column, lat: Column, lon: Column) -> Column:
        # inline contract guard: rides the cell expression (never
        # pruned, evaluated map-side with zero extra passes); raises
        # on the first out-of-contract row instead of under-returning
        ok = (F.abs(lat) <= 60.0) & (F.abs(lon) <= 180.0 - 2 * lon_step)
        return F.when(ok, col).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "radius_join contract violation: need |lat| <= 60 "
                        f"and |lon| <= {180.0 - 2 * lon_step:.4f} (no "
                        "antimeridian wrap); got (lat, lon) = ("
                    ),
                    lat.cast("string"),
                    F.lit(", "),
                    lon.cast("string"),
                    F.lit(")"),
                )
            ).cast("double")
        )

    p = points.withColumn(
        "__cell",
        F.struct(
            F.floor(
                _checked(F.col(plat), F.col(plat), F.col(plon)) / lat_step
            ).alias("r"),
            F.floor(F.col(plon) / lon_step).alias("c"),
        ),
    )
    q = queries.withColumn(
        "__cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (
                            F.floor(
                                _checked(F.col(qlat), F.col(qlat), F.col(qlon))
                                / lat_step
                            )
                            + dr
                        ).alias("r"),
                        (F.floor(F.col(qlon) / lon_step) + dc).alias("c"),
                    )
                    for dr in (-1, 0, 1)
                    for dc in (-1, 0, 1)
                ]
            )
        ),
    )
    dist = F.round(
        haversine_m(F.col(qlat), F.col(qlon), F.col(plat), F.col(plon)), 0
    )
    return (
        q.join(p, "__cell")
        .withColumn("distance_m", dist)
        .filter(F.col("distance_m") <= radius_m)
        .drop("__cell")
    )
