"""Layer presets: network filters and per-layer tag-column lists.

Network filter dicts reproduce the OSMnx-derived presets of
``config/osm_filters.py:19-137`` (driving/walking/cycling exclude
filters over highway ways). Tag-column lists are the working subset of
``config/default_tags.py`` that the synthetic world exercises — the
engine keeps the full tags map on every row, so widening these lists
is presentation-only (SURVEY.md §1.3: schema-on-read over a map).
"""

from __future__ import annotations

# oneway values marking a directed edge (config/__init__.py:102)
ONEWAY_VALUES = ["yes", "true", "1", "-1", "T", "F"]
# values meaning "against the digitized direction" (graph_export.pyx:292)
ONEWAY_AGAINST = ["-1", "T"]

_DRIVE_EXCLUDE_HIGHWAY = [
    "cycleway", "footway", "path", "pedestrian", "steps", "track",
    "corridor", "elevator", "escalator", "proposed", "construction",
    "bridleway", "abandoned", "platform", "raceway",
]
_WALK_EXCLUDE_HIGHWAY = [
    "cycleway", "motor", "proposed", "construction", "abandoned",
    "platform", "raceway", "motorway", "motorway_link",
]
_CYCLE_EXCLUDE_HIGHWAY = [
    "footway", "steps", "corridor", "elevator", "escalator", "motor",
    "proposed", "construction", "abandoned", "platform", "raceway",
    "motorway", "motorway_link",
]


_NETWORK_TYPES = ("walking", "driving", "driving+psv", "driving+service",
                  "driving_psv", "cycling", "all")


def network_filter(network_type: str) -> dict | None:
    """Exclude-filter dict per network type (config/osm_filters.py).
    Unknown/non-string types raise the reference's error shape
    (pyrosm.py:273-284, case-insensitive)."""
    if not isinstance(network_type, str) or (
            network_type.lower() not in _NETWORK_TYPES):
        raise ValueError(
            "'network_type' should be one of the following: "
            + ", ".join(_NETWORK_TYPES))
    network_type = network_type.lower()
    # "driving+service" is the user-facing alias the reference maps to
    # its psv-inclusive driving filter (pyrosm.py:290-291).
    # "driving_psv" is ALSO in the reference's accepted list (it is the
    # Conf attribute name, config/__init__.py:97) — there its if-chain
    # falls through and silently returns the unfiltered all-network, a
    # bug this engine does not replicate: here it means what it says,
    # the psv-inclusive driving filter.
    if network_type in ("driving", "driving+psv", "driving+service",
                        "driving_psv"):
        f = {
            "area": ["yes"],
            "highway": list(_DRIVE_EXCLUDE_HIGHWAY),
            "motor_vehicle": ["no"],
            "motorcar": ["no"],
            "service": ["parking", "parking_aisle", "private",
                        "emergency_access"],
        }
        if network_type == "driving":
            f["psv"] = ["yes"]
        return f
    if network_type == "walking":
        return {
            "area": ["yes"],
            "highway": list(_WALK_EXCLUDE_HIGHWAY),
            "foot": ["no"],
            "service": ["private"],
        }
    if network_type == "cycling":
        return {
            "area": ["yes"],
            "highway": list(_CYCLE_EXCLUDE_HIGHWAY),
            "bicycle": ["no"],
            "service": ["private"],
        }
    return None  # "all": every highway way


# direction-override suffix per network type (graphs.py:36-130: cycling
# uses oneway:bicycle contraflow exceptions)
DIRECTION_SUFFIX = {"cycling": "bicycle"}

# Full reference-parity candidate lists (config/default_tags.py via
# operators/default_tags.py). The engine materializes only OCCURRING
# candidates (functions/tags.py occurring_keys), so wide lists cost one
# key-scan aggregation, not plan width.
from pyrosm_spark.operators.default_tags import (  # noqa: E402
    BASIC_INFO_TAGS,
    TAG_COLUMNS,
)


def _union(*keys: str) -> list:
    seen: set = set()
    out: list = []
    for k in keys:
        for t in TAG_COLUMNS[k]:
            if t not in seen:
                seen.add(t)
                out.append(t)
    return out


NETWORK_TAG_COLS = _union("highway")
BUILDING_TAG_COLS = _union("building")
# reference get_pois default filter = {amenity, shop, tourism}
# (pyrosm.py:974-985): columns are the union of those lists
POI_TAG_COLS = _union("amenity", "shop", "tourism")
LANDUSE_TAG_COLS = _union("landuse")
NATURAL_TAG_COLS = _union("natural")
BOUNDARY_TAG_COLS = _union("boundary")
