"""User-input validators — the reference's ``utils/__init__.py:16-190``
semantics (same error classes, same coercions) re-expressed for the
Spark engine's surface. Pure Python; no Spark dependency.
"""

from __future__ import annotations

import re

BOUNDARY_TYPES = [
    "administrative", "national_park", "political", "postal_code",
    "protected_area", "aboriginal_lands", "maritime", "marker",
    "lot", "parcel", "tract", "all",
]

GRAPH_TYPES = ["networkx", "igraph", "pandana"]


def validate_custom_filter(custom_filter):
    """utils/__init__.py:16-74. Advanced forms (bracket-filter string,
    list of them, or a dict containing compiled-regex values) pass
    through to the filter compiler — compilation validates syntax. A
    plain dict is type-checked: string keys; values True (coerced to
    [True]) or a list of strings / True / re.Pattern."""
    from pyrosm_spark.functions.filters import is_advanced_filter

    if custom_filter is None:
        return None
    if is_advanced_filter(custom_filter):
        return custom_filter
    if not isinstance(custom_filter, dict):
        raise ValueError(
            f"'custom_filter' should be a Python dictionary. "
            f"Got {custom_filter} with type {type(custom_filter)}.")
    out = {}
    for k, v in custom_filter.items():
        if not isinstance(k, str):
            raise ValueError(
                f"OSM key in 'custom_filter' should be string. "
                f"Got {k} of type {type(k)}")
        if v is True:
            out[k] = [True]
            continue
        if not isinstance(v, list):
            raise ValueError(
                f"'custom_filter' values should be lists or True. "
                f"Got {v} of type {type(v)}")
        for item in v:
            if not (isinstance(item, str) or item is True
                    or isinstance(item, re.Pattern)):
                raise ValueError(
                    f"Elements in 'custom_filter' value lists should be "
                    f"strings. Got {item} of type {type(item)}")
        out[k] = v
    return out


def validate_osm_keys(osm_keys):
    """utils/__init__.py:77-83."""
    if osm_keys is not None and not isinstance(osm_keys, (str, list)):
        raise ValueError(
            f"'osm_keys_to_keep' -parameter should be of type str or "
            f"list. Got {osm_keys} of type {type(osm_keys)}.")
    return osm_keys


def validate_tags_as_columns(tags_as_columns):
    """utils/__init__.py:86-97."""
    if not isinstance(tags_as_columns, list):
        raise ValueError(
            f"'tags_as_columns' should be a list. "
            f"Got {tags_as_columns} of type {type(tags_as_columns)}.")
    for col in tags_as_columns:
        if not isinstance(col, str):
            raise ValueError(
                f"All tags listed in 'tags_as_columns' should be "
                f"strings. Got {col} of type {type(col)}.")
    return tags_as_columns


def validate_booleans(keep_nodes, keep_ways, keep_relations):
    """utils/__init__.py:100-114 — incl. the at-least-one rule."""
    for name, val in (("keep_nodes", keep_nodes),
                      ("keep_ways", keep_ways),
                      ("keep_relations", keep_relations)):
        if not isinstance(val, bool):
            raise ValueError(
                f"'{name}' should be boolean type: True or False")
    if not (keep_nodes or keep_ways or keep_relations):
        raise ValueError(
            "At least on of the following parameters should be True: "
            "'keep_nodes', 'keep_ways', or 'keep_relations'")


def validate_boundary_type(boundary_type):
    """utils/__init__.py:117-148 — strip+lower normalization."""
    allowed_text = ", ".join(BOUNDARY_TYPES)
    if not isinstance(boundary_type, str):
        raise ValueError(
            f"'boundary_type' should be one of the following: "
            f"{allowed_text}. Got '{boundary_type}' of type "
            f"{type(boundary_type)}.")
    boundary_type = boundary_type.strip().lower()
    if boundary_type not in BOUNDARY_TYPES:
        raise ValueError(
            f"'boundary_type' should be one of the following: "
            f"{allowed_text}. Got '{boundary_type}'.")
    return boundary_type


def validate_graph_type(graph_type):
    """utils/__init__.py:181-190 (pandarm dropped: lib long obsolete)."""
    if not isinstance(graph_type, str):
        raise ValueError("'graph_type' should be a string.")
    graph_type = graph_type.lower()
    if graph_type not in GRAPH_TYPES:
        raise ValueError(
            f"'graph_type' should be one of: {', '.join(GRAPH_TYPES)}. "
            f"Got '{graph_type}'.")
    return graph_type
