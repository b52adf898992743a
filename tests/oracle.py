"""Driver-side pure-Python oracle of the reference semantics.

An independent re-implementation (pandas/pyarrow over the raw parquet
rows) of pyrosm's filter + coordinate-join + length semantics, used for
row-for-row differential checks against the Spark engine — the testing
model of the reference's own engine-parity suite
(``tests/test_engine.py``: out-of-core engine vs in-memory reader).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from pyrosm_spark.functions.geometry_np import haversine_m_np


def load_rows(path: str) -> list:
    return pq.read_table(path).to_pylist()


def tagdict(row) -> dict:
    return dict(row["tags"]) if row["tags"] else {}


def dict_matches(tags: dict, data_filter: dict) -> bool:
    """Solver.isin_check OR-across-keys (data_filter.pyx:27-31,160-189)."""
    for k, vals in data_filter.items():
        if k in tags:
            if vals is True or True in [v for v in vals if v is True]:
                return True
            if tags[k] in [v for v in vals if isinstance(v, str)]:
                return True
    return False


def keep_way(tags: dict, data_filter, osm_keys, filter_type) -> bool:
    if not any(k in tags for k in osm_keys):
        return False
    if data_filter is None or len(data_filter) == 0:
        return filter_type == "keep"
    m = dict_matches(tags, data_filter)
    return m if filter_type == "keep" else not m


def resolve_coords(refs: list, node_xy: dict) -> np.ndarray:
    """J1 oracle: ordered subsequence of resolvable refs."""
    pts = [node_xy[r] for r in refs if r in node_xy]
    return np.array(pts, dtype=np.float64) if pts else np.empty((0, 2))


def way_length_m(coords: np.ndarray) -> float:
    """G10 oracle: per-segment round(3), way-level round(0)."""
    if len(coords) < 2:
        return 0.0
    seg = haversine_m_np(
        coords[:-1, 1], coords[:-1, 0], coords[1:, 1], coords[1:, 0]
    ).round(3)
    return float(seg.sum().round(0))


def network_oracle(synth_dir: str, data_filter, osm_keys=("highway",),
                   filter_type="exclude") -> dict:
    """way_id -> (n_points, length_m) for ways passing the filter with
    >=2 resolvable refs and visible=true."""
    nodes = load_rows(f"{synth_dir}/osm_nodes.parquet")
    ways = load_rows(f"{synth_dir}/osm_ways.parquet")
    node_xy = {
        n["id"]: (n["lon"], n["lat"]) for n in nodes if n["visible"]
    }
    out = {}
    for w in ways:
        if not w["visible"]:
            continue
        tags = tagdict(w)
        if not keep_way(tags, data_filter, osm_keys, filter_type):
            continue
        coords = resolve_coords(w["refs"], node_xy)
        if len(coords) < 2:
            continue
        out[w["id"]] = (len(coords), way_length_m(coords))
    return out
