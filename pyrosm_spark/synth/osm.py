"""Deterministic OSM-element-model synthetic world.

Generates ``osm_nodes`` / ``osm_ways`` / ``osm_relations`` parquet tables
shaped like pyrosm's parsed IR (SURVEY.md §1; ``pbfreader.pyx:193-208``
nodes, ``:355-374`` ways, ``:400-455`` relations), containing every
filter/geometry case catalogued in FIXTURES.md §3-4:

* a jittered street grid with every highway preset class incl. the
  excluded values, oneway/-1/T/roundabout variants, access tags,
  ``oneway:bicycle`` contraflow
* closed ways with building/area-tag overrides (polygon vs linestring
  decision, ``geometry.pyx:381-389``)
* bbox-straddling ways (complete-ways semantics), ways with missing
  refs, <2 resolvable refs, untagged member-only ways, untagged
  standalone ways
* multipolygon relations: hole, island-in-hole, rings split across
  member ways, an unclosed ring; boundary/route relations; member-id
  collisions across id spaces; duplicate member ids
* tag-value bait: coercion ladder values, regex targets, a tag keyed
  literally ``id``

Tags are written twice: as a ``map<string,string>`` column (what the
engine queries) AND as materialized plain string columns for a fixed key
list (what DuckDB oracles read) — two independent paths to the same
truth, so oracle agreement actually verifies the map-based engine logic.

Everything is seeded (numpy default_rng(seed)); same args -> identical
bytes, so generated parquet is safe to cache/commit.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Region extent ("Helsinki-ish"); the canonical test bbox cuts it.
LON_MIN, LON_MAX = 24.6, 25.2
LAT_MIN, LAT_MAX = 60.1, 60.4

# The bbox used by bbox-semantics tests: interior ~60% of the region.
TEST_BBOX = (24.72, 60.16, 25.08, 60.34)

# Materialized oracle tag columns.
WAY_TAG_COLS = [
    "highway", "building", "landuse", "natural", "amenity", "shop",
    "leisure", "tourism", "boundary", "waterway", "railway", "barrier",
    "route", "area", "oneway", "oneway:bicycle", "junction", "service",
    "access", "foot", "bicycle", "motor_vehicle", "motorcar", "psv",
    "name", "maxspeed", "ref", "lanes",
]
NODE_TAG_COLS = [
    "amenity", "shop", "tourism", "natural", "name", "crossing", "highway",
]
REL_TAG_COLS = [
    "type", "building", "boundary", "route", "waterway", "landuse",
    "natural", "name", "admin_level", "area",
]

HIGHWAY_CLASSES = [
    "motorway", "trunk", "primary", "secondary", "tertiary", "residential",
    "service", "unclassified", "living_street", "cycleway", "footway",
    "path", "pedestrian", "steps", "track", "construction", "proposed",
    "bridleway", "platform", "raceway", "corridor", "elevator", "escalator",
    "abandoned", "motorway_link",
]
BUILDING_TYPES = ["yes", "residential", "commercial", "industrial", "retail",
                  "apartments", "house", "garage", "school", "church"]
AMENITIES = ["restaurant", "cafe", "school", "hospital", "bank", "pharmacy",
             "fuel", "parking", "library", "bar"]
SHOPS = ["supermarket", "bakery", "convenience", "clothes", "electronics"]
LANDUSE = ["residential", "commercial", "industrial", "forest", "meadow",
           "farmland", "grass", "retail"]
NATURAL = ["water", "wood", "wetland", "scrub", "beach", "grassland"]

_TS0 = 1_500_000_000  # 2017-07-14T02:40:00Z


class _World:
    """Mutable accumulator for the generated element tables."""

    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)
        self.nodes: list = []       # (id, lon, lat, tags)
        self.ways: list = []        # (id, refs, tags)
        self.relations: list = []   # (id, members, tags)
        self._nid = 0
        self._wid = 0
        self._rid = 0

    def add_node(self, lon: float, lat: float, tags: dict | None = None) -> int:
        self._nid += 1
        self.nodes.append((self._nid, float(lon), float(lat), tags or {}))
        return self._nid

    def add_way(self, refs: list, tags: dict | None = None) -> int:
        self._wid += 1
        self.ways.append((self._wid, [int(r) for r in refs], tags or {}))
        return self._wid

    def add_relation(self, members: list, tags: dict | None = None) -> int:
        """members: list of (member_id, member_type, member_role)."""
        self._rid += 1
        self.relations.append((self._rid, members, tags or {}))
        return self._rid

    def ring_way(self, cx, cy, r_lon, r_lat, n_pts, tags, phase=0.0) -> int:
        ang = np.linspace(0, 2 * np.pi, n_pts, endpoint=False) + phase
        refs = [
            self.add_node(cx + r_lon * np.cos(a), cy + r_lat * np.sin(a))
            for a in ang
        ]
        refs.append(refs[0])  # closed
        return self.add_way(refs, tags)

    def ring_ways_split(self, cx, cy, r_lon, r_lat, n_pts, n_parts, tags_each):
        """A closed ring split across n_parts open member ways."""
        ang = np.linspace(0, 2 * np.pi, n_pts, endpoint=False)
        node_ids = [
            self.add_node(cx + r_lon * np.cos(a), cy + r_lat * np.sin(a))
            for a in ang
        ]
        node_ids.append(node_ids[0])
        bounds = np.linspace(0, n_pts, n_parts + 1).astype(int)
        way_ids = []
        for p in range(n_parts):
            seg = node_ids[bounds[p]: bounds[p + 1] + 1]
            way_ids.append(self.add_way(seg, tags_each))
        return way_ids


def _build_street_grid(w: _World, grid: int):
    """Jittered grid of intersections; streets between neighbors with 1-3
    intermediate vertices; highway classes cycled over all preset cases."""
    rng = w.rng
    lon_s = np.linspace(LON_MIN + 0.01, LON_MAX - 0.01, grid)
    lat_s = np.linspace(LAT_MIN + 0.005, LAT_MAX - 0.005, grid)
    jit_lon = (lon_s[1] - lon_s[0]) * 0.15
    jit_lat = (lat_s[1] - lat_s[0]) * 0.15
    inter = np.empty((grid, grid), dtype=np.int64)
    coords = {}
    for i in range(grid):
        for j in range(grid):
            lon = lon_s[i] + rng.uniform(-jit_lon, jit_lon)
            lat = lat_s[j] + rng.uniform(-jit_lat, jit_lat)
            inter[i, j] = w.add_node(lon, lat)
            coords[inter[i, j]] = (lon, lat)

    def street(n_a: int, n_b: int, k: int):
        (lo_a, la_a), (lo_b, la_b) = coords[n_a], coords[n_b]
        n_mid = int(rng.integers(1, 4))
        refs = [n_a]
        for m in range(1, n_mid + 1):
            t = m / (n_mid + 1)
            refs.append(
                w.add_node(
                    lo_a + (lo_b - lo_a) * t + rng.uniform(-jit_lon, jit_lon) * 0.3,
                    la_a + (la_b - la_a) * t + rng.uniform(-jit_lat, jit_lat) * 0.3,
                )
            )
        refs.append(n_b)
        hw = HIGHWAY_CLASSES[k % len(HIGHWAY_CLASSES)]
        tags = {"highway": hw}
        # variant index must be independent of the k % 10 gate: an
        # expression like [..][k % 5] inside `k % 10 == 0` always picks
        # element 0 (k % 10 == 0 implies k % 5 == 0), silently killing
        # every other variant — and with it the oracle gate's coverage
        # of e.g. the '-1'/'T' oneway reversal path
        m10, variant = k % 10, k // 10
        if m10 == 0:
            tags["oneway"] = ["yes", "-1", "T", "true", "1"][variant % 5]
        elif m10 == 1:
            tags["junction"] = "roundabout"
        elif m10 == 2:
            tags["service"] = ["parking", "parking_aisle", "private",
                               "emergency_access", "driveway"][variant % 5]
        elif m10 == 3:
            tags["foot"] = "no" if variant % 2 else "yes"
        elif m10 == 4:
            tags["bicycle"] = "no" if variant % 2 else "designated"
        elif m10 == 5:
            tags["motor_vehicle"] = "no" if variant % 2 else "yes"
        elif m10 == 6:
            tags["oneway"] = "yes"
            tags["oneway:bicycle"] = "no"  # contraflow cycling
        elif m10 == 7:
            tags["psv"] = "yes" if variant % 2 else "no"
        elif m10 == 8:
            # index by `variant`, NOT k: k%10==8 forces k even, so
            # k%6 / k%4 would only ever hit even indices (dead
            # variants 40/60/100 and lanes 2/4 — the correlated-gate
            # bug class this block's siblings already avoid)
            tags["maxspeed"] = str([30, 40, 50, 60, 80, 100][variant % 6])
            tags["lanes"] = str(1 + variant % 4)
        if k % 13 == 0:
            tags["name"] = f"Street {k}"
        if k % 17 == 0:
            tags["ref"] = ["I 20", "I-20", "E75", "Route 66"][k % 4]
        if k % 23 == 0:
            tags["motorcar"] = "no"
        w.add_way(refs, tags)

    k = 0
    for i in range(grid):
        for j in range(grid - 1):
            street(inter[i, j], inter[i, j + 1], k); k += 1
    for j in range(grid):
        for i in range(grid - 1):
            street(inter[i, j], inter[i + 1, j], k); k += 1
    return inter, coords


def _build_area_features(w: _World, grid: int):
    """Buildings / landuse / natural closed ways + the area-rule cases."""
    rng = w.rng
    n_buildings = grid * grid
    for b in range(n_buildings):
        cx = rng.uniform(LON_MIN + 0.02, LON_MAX - 0.02)
        cy = rng.uniform(LAT_MIN + 0.01, LAT_MAX - 0.01)
        rl = rng.uniform(0.0004, 0.0012)
        rt = rng.uniform(0.0002, 0.0006)
        tags = {"building": BUILDING_TYPES[b % len(BUILDING_TYPES)]}
        if b % 11 == 0:
            tags["name"] = f"Building {b}"
        if b % 7 == 0:
            tags["amenity"] = AMENITIES[b % len(AMENITIES)]
        if b % 19 == 0:
            tags["height"] = ["5", "5.0", "fast"][b % 3]  # coercion ladder
        w.ring_way(cx, cy, rl, rt, 4 + b % 3, tags, phase=rng.uniform(0, np.pi))

    for l in range(max(4, grid // 2)):
        cx = rng.uniform(LON_MIN + 0.04, LON_MAX - 0.04)
        cy = rng.uniform(LAT_MIN + 0.02, LAT_MAX - 0.02)
        w.ring_way(cx, cy, rng.uniform(0.004, 0.012), rng.uniform(0.002, 0.006),
                   8, {"landuse": LANDUSE[l % len(LANDUSE)]})
        w.ring_way(cx + 0.01, cy + 0.005, rng.uniform(0.002, 0.008),
                   rng.uniform(0.001, 0.004), 7,
                   {"natural": NATURAL[l % len(NATURAL)]})

    # Area-rule corner cases (geometry.pyx:381-389):
    cx, cy = (LON_MIN + LON_MAX) / 2, (LAT_MIN + LAT_MAX) / 2
    w.ring_way(cx, cy, 0.001, 0.0006, 5, {"highway": "pedestrian"})            # closed+linear -> LineString
    w.ring_way(cx + 0.004, cy, 0.001, 0.0006, 5,
               {"highway": "pedestrian", "area": "yes"})                        # area=yes wins -> Polygon
    w.ring_way(cx + 0.008, cy, 0.001, 0.0006, 5,
               {"building": "yes", "area": "no"})                               # area=no wins -> LineString
    w.ring_way(cx + 0.012, cy, 0.001, 0.0006, 5, {"barrier": "wall"})           # linear tag -> LineString
    w.ring_way(cx + 0.016, cy, 0.001, 0.0006, 5, {"leisure": "park"})           # plain closed -> Polygon


def _build_edge_cases(w: _World):
    """FIXTURES §3 way edge cases that aren't part of the grid/areas."""
    cx, cy = LON_MIN + 0.05, LAT_MAX - 0.03
    # way referencing a missing node id (subsequence-preserving drop, J1)
    a = w.add_node(cx, cy)
    b = w.add_node(cx + 0.002, cy + 0.001)
    c = w.add_node(cx + 0.004, cy)
    w.add_way([a, 99_999_999, b, 88_888_888, c], {"highway": "residential",
                                                  "name": "Gappy Road"})
    # way with < 2 resolvable refs -> dropped by geometry assembly
    d = w.add_node(cx + 0.006, cy)
    w.add_way([d, 77_777_777], {"highway": "residential", "name": "Stub"})
    # untagged standalone way -> dropped under keep_all
    e = [w.add_node(cx + 0.008 + 0.001 * i, cy) for i in range(3)]
    w.add_way(e, {})
    # a node with a tag literally keyed 'id' (-> id_tag rename)
    w.add_node(cx, cy - 0.002, {"amenity": "cafe", "id": "legacy-77"})
    # bbox-straddling ways: one ref inside TEST_BBOX, ends outside
    x0, y0, x1, y1 = TEST_BBOX
    for off in (0.0, 0.003, 0.006):
        n_in = w.add_node(x0 + 0.01 + off, y0 + 0.01)
        n_out = w.add_node(x0 - 0.05 + off, y0 - 0.02)
        n_out2 = w.add_node(x0 - 0.08 + off, y0 - 0.03)
        w.add_way([n_out2, n_out, n_in],
                  {"highway": "primary", "name": f"Straddler {off}"})


def _build_pois(w: _World, grid: int):
    rng = w.rng
    for p in range(grid * grid // 2):
        lon = rng.uniform(LON_MIN + 0.01, LON_MAX - 0.01)
        lat = rng.uniform(LAT_MIN + 0.005, LAT_MAX - 0.005)
        tags = {}
        # index by p//4, not p: the m == p%4 gate pins p's parity, so
        # p%len(list) would reach only even (amenity) / odd-aligned
        # (shop) indices — half the declared values would never exist
        m, pv = p % 4, p // 4
        if m == 0:
            tags["amenity"] = AMENITIES[pv % len(AMENITIES)]
        elif m == 1:
            tags["shop"] = SHOPS[pv % len(SHOPS)]
        elif m == 2:
            tags["tourism"] = ["hotel", "museum", "viewpoint"][pv % 3]
        else:
            tags["natural"] = "tree"
        if p % 5 == 0:
            tags["name"] = f"POI {p}"
        w.add_node(lon, lat, tags)


def _build_relations(w: _World):
    """FIXTURES §4 relation cases."""
    cx, cy = (LON_MIN + LON_MAX) / 2 - 0.1, (LAT_MIN + LAT_MAX) / 2

    # 1. multipolygon with a hole (outer + inner), untagged member ways
    outer = w.ring_way(cx, cy, 0.01, 0.005, 12, {})
    inner = w.ring_way(cx, cy, 0.004, 0.002, 8, {})
    w.add_relation(
        [(outer, "way", "outer"), (inner, "way", "inner")],
        {"type": "multipolygon", "building": "yes", "name": "Holey"},
    )
    # 2. island-in-hole (even-odd: 3 nested rings)
    o2 = w.ring_way(cx + 0.05, cy, 0.012, 0.006, 12, {})
    h2 = w.ring_way(cx + 0.05, cy, 0.007, 0.0035, 10, {})
    i2 = w.ring_way(cx + 0.05, cy, 0.003, 0.0015, 8, {})
    w.add_relation(
        [(o2, "way", "outer"), (h2, "way", "inner"), (i2, "way", "outer")],
        {"type": "multipolygon", "landuse": "forest", "name": "IslandInHole"},
    )
    # 3. ring split across member ways + separate hole
    parts = w.ring_ways_split(cx - 0.06, cy, 0.011, 0.0055, 12, 3, {})
    h3 = w.ring_way(cx - 0.06, cy, 0.004, 0.002, 8, {})
    w.add_relation(
        [(p, "way", "outer") for p in parts] + [(h3, "way", "inner")],
        {"type": "multipolygon", "building": "public", "name": "SplitRing"},
    )
    # 4. unclosed ring (open member chain) -> ring dropped; relation dropped
    a = w.add_node(cx - 0.1, cy + 0.02)
    b = w.add_node(cx - 0.098, cy + 0.022)
    c = w.add_node(cx - 0.096, cy + 0.02)
    open_way = w.add_way([a, b, c], {})
    w.add_relation([(open_way, "way", "outer")],
                   {"type": "multipolygon", "building": "yes", "name": "Open"})
    # 5. boundary relation (admin) from a split ring
    bparts = w.ring_ways_split(cx + 0.1, cy + 0.03, 0.02, 0.01, 16, 4, {})
    w.add_relation(
        [(p, "way", "outer") for p in bparts],
        {"type": "boundary", "boundary": "administrative", "admin_level": "8",
         "name": "Testilä"},
    )
    w.add_relation(
        [(bparts[0], "way", "outer")],
        {"type": "boundary", "boundary": "national_park", "name": "Kansallispuisto"},
    )
    # 6. route relation (force-linestring) over existing street ways
    street_ids = [wid for wid, _, t in w.ways if t.get("highway") in
                  ("primary", "secondary")][:5]
    if street_ids:
        w.add_relation(
            [(s, "way", "") for s in street_ids],
            {"type": "route", "route": "bus", "name": "Bus 55"},
        )
    # 7. waterway=riverbank exception (area despite waterway key)
    r7 = w.ring_way(cx + 0.08, cy - 0.04, 0.008, 0.004, 10, {})
    w.add_relation([(r7, "way", "outer")],
                   {"type": "multipolygon", "waterway": "riverbank",
                    "natural": "water", "name": "Riverbank"})
    # 8. node + relation members, ids colliding with way-id space
    n8 = w.add_node(cx, cy - 0.05, {"amenity": "fountain"})
    w.add_relation(
        [(outer, "way", "outer"), (n8, "node", "label"), (1, "relation", "sub")],
        {"type": "multipolygon", "leisure": "park", "name": "Collide"},
    )
    # 9. duplicate member ids within one relation
    w.add_relation(
        [(outer, "way", "outer"), (outer, "way", "outer"), (inner, "way", "inner")],
        {"type": "multipolygon", "building": "yes", "name": "DupMembers"},
    )
    # 9b. relation referencing a missing member way (straddling-relation
    # diagnostic A9, frames.pyx:142-160)
    r9b = w.ring_way(cx - 0.12, cy - 0.04, 0.006, 0.003, 8, {})
    w.add_relation(
        [(r9b, "way", "outer"), (77_777_001, "way", "outer")],
        {"type": "multipolygon", "building": "yes", "name": "MissingMember"},
    )
    # 10. bbox-straddling multipolygon: outer ring crosses TEST_BBOX edge
    x0, y0, _, _ = TEST_BBOX
    ws = w.ring_way(x0, y0 + 0.05, 0.02, 0.01, 12, {})
    w.add_relation([(ws, "way", "outer")],
                   {"type": "multipolygon", "landuse": "meadow",
                    "name": "BoxStraddler"})


def _tags_to_cols(tags_list: list, cols: list) -> dict:
    return {
        c: [t.get(c) for t in tags_list]
        for c in cols
    }


def _meta_arrays(rng: np.random.Generator, n: int) -> dict:
    version = rng.integers(1, 12, n).astype(np.int32)
    ts = _TS0 + rng.integers(0, 200_000_000, n).astype(np.int64)
    changeset = rng.integers(1_000_000, 90_000_000, n).astype(np.int64)
    visible = rng.random(n) > 0.01  # ~1% deleted rows (history semantics)
    return {
        "version": version,
        "changeset": changeset,
        "timestamp": ts,
        "visible": visible,
    }


_MEMBER_TYPE = pa.struct(
    [
        ("member_id", pa.int64()),
        ("member_type", pa.string()),
        ("member_role", pa.string()),
    ]
)


def generate_osm_tables(out_dir: str, grid: int = 16, seed: int = 42) -> dict:
    """Generate the three tables into ``out_dir``; returns name->path."""
    w = _World(seed)
    _build_street_grid(w, grid)
    _build_area_features(w, grid)
    _build_pois(w, grid)
    _build_edge_cases(w)
    _build_relations(w)

    os.makedirs(out_dir, exist_ok=True)
    rng_meta = np.random.default_rng(seed + 1)

    # nodes -------------------------------------------------------------
    ids = pa.array([n[0] for n in w.nodes], pa.int64())
    lons = pa.array([n[1] for n in w.nodes], pa.float64())
    lats = pa.array([n[2] for n in w.nodes], pa.float64())
    tag_dicts = [n[3] for n in w.nodes]
    tags = pa.array([list(t.items()) for t in tag_dicts],
                    pa.map_(pa.string(), pa.string()))
    meta = _meta_arrays(rng_meta, len(w.nodes))
    cols = {"id": ids, "lon": lons, "lat": lats, "tags": tags}
    cols.update(_tags_to_cols(tag_dicts, NODE_TAG_COLS))
    cols["n_tags"] = pa.array([len(t) for t in tag_dicts], pa.int32())
    cols.update({k: pa.array(v) for k, v in meta.items()})
    pq.write_table(pa.table(cols), os.path.join(out_dir, "osm_nodes.parquet"))

    # ways ---------------------------------------------------------------
    tag_dicts = [x[2] for x in w.ways]
    cols = {
        "id": pa.array([x[0] for x in w.ways], pa.int64()),
        "refs": pa.array([x[1] for x in w.ways], pa.list_(pa.int64())),
        "tags": pa.array([list(t.items()) for t in tag_dicts],
                         pa.map_(pa.string(), pa.string())),
    }
    oc = _tags_to_cols(tag_dicts, WAY_TAG_COLS)
    oc["oneway_bicycle"] = oc.pop("oneway:bicycle")
    cols.update(oc)
    cols["n_tags"] = pa.array([len(t) for t in tag_dicts], pa.int32())
    cols["n_refs"] = pa.array([len(x[1]) for x in w.ways], pa.int32())
    cols["is_closed"] = pa.array(
        [len(x[1]) >= 4 and x[1][0] == x[1][-1] for x in w.ways], pa.bool_()
    )
    meta = _meta_arrays(np.random.default_rng(seed + 2), len(w.ways))
    cols.update({k: pa.array(v) for k, v in meta.items()})
    pq.write_table(pa.table(cols), os.path.join(out_dir, "osm_ways.parquet"))

    # relations -----------------------------------------------------------
    tag_dicts = [x[2] for x in w.relations]
    members = pa.array(
        [
            [
                {"member_id": int(mid), "member_type": mt, "member_role": mr}
                for (mid, mt, mr) in x[1]
            ]
            for x in w.relations
        ],
        pa.list_(_MEMBER_TYPE),
    )
    cols = {
        "id": pa.array([x[0] for x in w.relations], pa.int64()),
        "members": members,
        "tags": pa.array([list(t.items()) for t in tag_dicts],
                         pa.map_(pa.string(), pa.string())),
    }
    cols.update(_tags_to_cols(tag_dicts, REL_TAG_COLS))
    cols["n_tags"] = pa.array([len(t) for t in tag_dicts], pa.int32())
    meta = _meta_arrays(np.random.default_rng(seed + 3), len(w.relations))
    cols.update({k: pa.array(v) for k, v in meta.items()})
    pq.write_table(pa.table(cols), os.path.join(out_dir, "osm_relations.parquet"))

    return {
        name: os.path.join(out_dir, f"{name}.parquet")
        for name in ("osm_nodes", "osm_ways", "osm_relations")
    }


def generate_history_table(out_dir: str, n_ids: int = 200,
                           seed: int = 42) -> str:
    """``osm_nodes_history`` — multiple versions per node id, exercising
    latest-at-or-before-t selection with PER-COLUMN last-non-null
    semantics (FIXTURES.md §5; reference ``data_filter.pyx:340-343``,
    ``pyrosm.py:206-213``) and deleted-version drops
    (``pbfreader.pyx:528-542``):

    * tags appear in one version and vanish in later ones (a non-null
      value must survive from the older version)
    * some ids end with a visible=false tombstone
    """
    rng = np.random.default_rng(seed + 99)
    rows = []  # (id, lon, lat, tags, version, changeset, ts, visible)
    for i in range(1, n_ids + 1):
        n_ver = int(rng.integers(1, 6))
        lon = float(rng.uniform(LON_MIN, LON_MAX))
        lat = float(rng.uniform(LAT_MIN, LAT_MAX))
        for v in range(1, n_ver + 1):
            tags = {}
            if v == 1 and i % 3 == 0:
                tags["name"] = f"Old name {i}"       # vanishes later
            if v == 2 and i % 4 == 0:
                tags["amenity"] = AMENITIES[i % len(AMENITIES)]
            if v == n_ver and i % 5 == 0:
                tags["name"] = f"Final name {i}"     # overrides v1 name
            visible = not (v == n_ver and i % 7 == 0)  # tombstones
            rows.append((
                i,
                lon + 0.0001 * v,
                lat + 0.00005 * v,
                tags,
                v,
                1_000_000 + i * 10 + v,
                _TS0 + i * 1000 + v * 100,
                visible,
            ))
    os.makedirs(out_dir, exist_ok=True)
    cols = {
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "lon": pa.array([r[1] for r in rows], pa.float64()),
        "lat": pa.array([r[2] for r in rows], pa.float64()),
        "tags": pa.array([list(r[3].items()) for r in rows],
                         pa.map_(pa.string(), pa.string())),
        "name": pa.array([r[3].get("name") for r in rows], pa.string()),
        "amenity": pa.array([r[3].get("amenity") for r in rows], pa.string()),
        "version": pa.array([r[4] for r in rows], pa.int32()),
        "changeset": pa.array([r[5] for r in rows], pa.int64()),
        "timestamp": pa.array([r[6] for r in rows], pa.int64()),
        "visible": pa.array([r[7] for r in rows], pa.bool_()),
    }
    path = os.path.join(out_dir, "osm_nodes_history.parquet")
    pq.write_table(pa.table(cols), path)
    return path


def ensure_osm_tables(out_dir: str, grid: int = 16, seed: int = 42) -> dict:
    paths = {
        name: os.path.join(out_dir, f"{name}.parquet")
        for name in ("osm_nodes", "osm_ways", "osm_relations",
                     "osm_nodes_history")
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    out = generate_osm_tables(out_dir, grid=grid, seed=seed)
    out["osm_nodes_history"] = generate_history_table(out_dir, seed=seed)
    return out
