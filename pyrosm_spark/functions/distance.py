"""Great-circle distance as a pure Catalyst expression (no UDF).

Replicates pyrosm's haversine exactly (reference ``distance.py:38-90``):
mean earth radius 6371.0088 km, per-segment lengths rounded to 3
decimals, way-level length = sum of segments rounded to 0 decimals —
the rounding is part of the parity contract with the reference's tests.

Staying in native SQL keeps the whole length computation inside
whole-stage codegen; at 100 TB this is the difference between a
column-at-a-time JVM loop and shipping every coordinate through Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AVG_EARTH_RADIUS_M = 6371.0088 * 1000.0


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (reference distance.py:38-74)."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    d = (
        F.pow(F.sin(dlat * 0.5), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon * 0.5), 2)
    )
    return F.lit(2.0 * AVG_EARTH_RADIUS_M) * F.asin(F.sqrt(d))


def segment_length_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Per-segment length, rounded to 3 decimals (distance.py:88-90)."""
    return F.round(haversine_m(lat1, lon1, lat2, lon2), 3)


# NOTE the fold order mirrors haversine_m EXACTLY —
# radians(lat2) - radians(lat1), never radians(lat2 - lat1): the two
# differ in the last ulp, which flips the rounded-to-3-decimals parity
# contract on ~1 in 4M segments.
HAVERSINE_SQL = (
    "2.0 * {R} * asin(sqrt("
    "pow(sin((radians({lat2}) - radians({lat1})) * 0.5), 2) "
    "+ cos(radians({lat1})) * cos(radians({lat2})) "
    "* pow(sin((radians({lon2}) - radians({lon1})) * 0.5), 2)))"
)


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as ANSI SQL text — used to build DuckDB oracles."""
    return HAVERSINE_SQL.format(
        R=AVG_EARTH_RADIUS_M, lat1=lat1, lon1=lon1, lat2=lat2, lon2=lon2
    )


class Unit:
    """Supported output units (reference distance.py:5-35; conversion
    factors from kilometers, same table)."""

    KILOMETERS = "km"
    METERS = "m"
    MILES = "mi"
    NAUTICAL_MILES = "nmi"
    FEET = "ft"
    INCHES = "in"


_CONVERSIONS_FROM_KM = {
    Unit.KILOMETERS: 1.0,
    Unit.METERS: 1000.0,
    Unit.MILES: 0.621371192,
    Unit.NAUTICAL_MILES: 0.539956803,
    Unit.FEET: 3280.839895013,
    Unit.INCHES: 39370.078740158,
}


def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
              unit: str = Unit.KILOMETERS) -> Column:
    """Unit-aware haversine Column (reference distance.py:38-74 —
    same radius, same conversion table; values match its own
    test_distance_calculation expectations)."""
    if unit not in _CONVERSIONS_FROM_KM:
        raise ValueError(
            f"unknown unit {unit!r}; one of "
            f"{sorted(_CONVERSIONS_FROM_KM)}")
    km = haversine_m(lat1, lon1, lat2, lon2) / F.lit(1000.0)
    return km * F.lit(_CONVERSIONS_FROM_KM[unit])
