"""Property-based tests (hypothesis) over the pure-python kernels.

The reference has no property testing (SURVEY.md §5); these go beyond
its strategy for the kernels where randomized inputs pay: the tile
index algebra, the WKB codec, the filter compiler's driver-side oracle,
and geometry primitives. No Spark — milliseconds per case.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrosm_spark.functions import geometry_np as G
from pyrosm_spark.functions import tiles

lons = st.floats(min_value=-180.0, max_value=180.0,
                 allow_nan=False, allow_infinity=False)
lats = st.floats(min_value=-90.0, max_value=90.0,
                 allow_nan=False, allow_infinity=False)
resolutions = st.integers(min_value=0, max_value=20)


# --------------------------------------------------------------------------
# Tile index algebra
# --------------------------------------------------------------------------

@given(lons, lats, resolutions)
def test_encode_decode_roundtrip(lon, lat, res):
    cell = tiles.encode_py(lon, lat, res)
    r, x, y = tiles.decode_py(cell)
    assert r == res
    assert 0 <= x < (1 << res) and 0 <= y < (1 << res)


@given(lons, lats, resolutions)
def test_point_inside_own_cell_bounds(lon, lat, res):
    cell = tiles.encode_py(lon, lat, res)
    xmin, ymin, xmax, ymax = tiles.cell_bounds_py(cell)
    # clamping at +180/+90 puts the point in the last cell, whose upper
    # bound equals the domain edge — closed on both sides there; a 1-ulp
    # tolerance covers float truncation at cell edges
    eps = 1e-9
    assert xmin - eps <= lon <= max(xmax, 180.0) + eps
    assert ymin - eps <= lat <= max(ymax, 90.0) + eps


@given(lons, lats, st.integers(min_value=1, max_value=18))
def test_parent_contains_child(lon, lat, res):
    child = tiles.encode_py(lon, lat, res)
    _, cx, cy = tiles.decode_py(child)
    parent = tiles.encode_py(lon, lat, res - 1)
    _, px, py = tiles.decode_py(parent)
    assert (cx >> 1, cy >> 1) == (px, py)


@given(st.lists(st.tuples(lons, lats), min_size=1, max_size=20),
       st.integers(min_value=1, max_value=10))
@settings(deadline=None)
def test_compact_uncompact_identity(points, res):
    cells = sorted({tiles.encode_py(lo, la, res) for lo, la in points})
    compacted = tiles.compact_py(cells)
    restored = tiles.uncompact_py(compacted, res)
    assert set(cells) <= set(restored)  # cover never shrinks
    assert len(compacted) <= len(cells)  # never grows
    # every restored cell is at res and within a compacted ancestor
    assert all(tiles.decode_py(c)[0] == res for c in restored)


@given(lons, lats, st.integers(min_value=2, max_value=12),
       st.integers(min_value=0, max_value=3))
def test_neighbors_block(lon, lat, res, ring):
    cell = tiles.encode_py(lon, lat, res)
    nbrs = tiles.neighbors_py(cell, ring)
    assert cell in nbrs
    assert len(nbrs) <= (2 * ring + 1) ** 2
    assert len(set(nbrs)) == len(nbrs)
    _, x, y = tiles.decode_py(cell)
    for nb in nbrs:
        _, nx, ny = tiles.decode_py(nb)
        assert abs(nx - x) <= ring and abs(ny - y) <= ring


@given(st.tuples(lons, lons), st.tuples(lats, lats),
       st.integers(min_value=0, max_value=8))
def test_bbox_cover_contains_inner_points(lon_pair, lat_pair, res):
    x0, x1 = sorted(lon_pair)
    y0, y1 = sorted(lat_pair)
    cover = set(tiles.bbox_cover_py(x0, y0, x1, y1, res))
    assert cover
    # the corners' cells are always in the cover
    for lo, la in [(x0, y0), (x0, y1), (x1, y0), (x1, y1),
                   ((x0 + x1) / 2, (y0 + y1) / 2)]:
        assert tiles.encode_py(lo, la, res) in cover


# --------------------------------------------------------------------------
# WKB codec
# --------------------------------------------------------------------------

coords_arrays = st.lists(st.tuples(lons, lats), min_size=2, max_size=30).map(
    lambda pts: np.array(pts, dtype=np.float64))


@given(coords_arrays)
def test_wkb_linestring_roundtrip(coords):
    t, back = G.parse_wkb(G.wkb_linestring(coords))
    assert t == G.WKB_LINESTRING
    assert np.array_equal(back, coords)


@given(lons, lats)
def test_wkb_point_roundtrip(lon, lat):
    t, (x, y) = G.parse_wkb(G.wkb_point(lon, lat))
    assert t == G.WKB_POINT and x == lon and y == lat


@given(st.lists(st.tuples(lons, lats), min_size=3, max_size=15))
def test_wkb_polygon_roundtrip_and_orientation(pts):
    ring = np.array(pts + pts[:1], dtype=np.float64)
    t, rings = G.parse_wkb(G.wkb_polygon([ring]))
    assert t == G.WKB_POLYGON
    assert np.array_equal(rings[0], ring)
    oriented = G.orient_ring(ring, ccw=True)
    # below ~1e-12 deg^2 the shoelace sum is float cancellation noise
    # and reversal cannot reliably flip its sign — not a real ring
    if abs(G.signed_area(ring)) > 1e-12:
        assert G.signed_area(oriented) > 0  # CCW = positive area
        # orientation preserves the point SET
        assert {tuple(p) for p in oriented} == {tuple(p) for p in ring}


# --------------------------------------------------------------------------
# Filter compiler oracle semantics
# --------------------------------------------------------------------------

tag_keys = st.sampled_from(["highway", "building", "amenity", "name", "x"])
tag_dicts = st.dictionaries(
    tag_keys, st.sampled_from(["residential", "yes", "no", "shop", "1"]),
    max_size=4)


@given(tag_dicts, tag_keys,
       st.sampled_from(["residential", "yes", "missing"]))
def test_condition_negation_partition(tags, key, value):
    """eq/ne and exists/nexists partition every tag dict (Overpass
    semantics: negative operators accept key-absent rows)."""
    from pyrosm_spark.functions.filters import Condition

    eq = Condition(key, "eq", value)
    ne = Condition(key, "ne", value)
    assert eq.matches(tags) != ne.matches(tags)
    ex = Condition(key, "exists")
    nex = Condition(key, "nexists")
    assert ex.matches(tags) != nex.matches(tags)


@given(tag_dicts)
def test_dict_filter_matches_solver_semantics(tags):
    """The compiled dict filter agrees with an independent evaluation
    of the reference's Solver rule (data_filter.pyx:16-36): OR across
    keys, True = any value, list = value membership."""
    from pyrosm_spark.functions.filters import CompiledFilter, _dict_to_groups

    spec = {"highway": ["residential", "yes"], "building": True}
    f = CompiledFilter(_dict_to_groups(spec))
    expected = ("highway" in tags
                and tags["highway"] in ("residential", "yes")) or \
        ("building" in tags)
    assert f.matches(tags) == expected


@given(tag_dicts)
def test_bracket_parser_matches_dict_form(tags):
    """'["k"="v"]' bracket form and {"k": ["v"]} dict form agree."""
    from pyrosm_spark.functions.filters import (
        CompiledFilter, _dict_to_groups, parse_bracket_filter)

    bracket = CompiledFilter(parse_bracket_filter('["highway"="residential"]'))
    dictf = CompiledFilter(_dict_to_groups({"highway": ["residential"]}))
    assert bracket.matches(tags) == dictf.matches(tags)


# ---------------------------------------------------------- G7 fix ladder

@given(st.lists(st.tuples(st.floats(min_value=-10, max_value=10,
                                    allow_nan=False),
                          st.floats(min_value=-10, max_value=10,
                                    allow_nan=False)),
                min_size=4, max_size=10, unique=True))
@settings(deadline=None, max_examples=60)
def test_polygonize_preserves_even_odd_parity(pts):
    """Noding + splitting a (possibly self-intersecting) ring regroups
    its segment set without changing it geometrically — so even-odd
    ray-cast membership at any probe point must be IDENTICAL between
    the original ring and the union of the split simple sub-rings
    (probe points away from edges). This is the invariant that makes
    the G7 repair safe inside the multipolygon overlay."""
    ring = np.array(list(pts) + [list(pts[0])], dtype=np.float64)
    parts = G.polygonize_ring(ring)
    if not parts:
        return
    rng = np.random.default_rng(7)
    px = rng.uniform(-12, 12, 80)
    py = rng.uniform(-12, 12, 80)
    orig = G.points_in_ring(px, py, ring)
    # union-of-simple-lobes equals parity only where windings don't
    # overlap; the exact invariant that always holds is XOR-parity
    xor = np.zeros_like(orig)
    for p in parts:
        xor ^= G.points_in_ring(px, py, p)
    assert np.array_equal(orig, xor)


@given(st.lists(st.tuples(st.floats(min_value=-5, max_value=5,
                                    allow_nan=False),
                          st.floats(min_value=-5, max_value=5,
                                    allow_nan=False)),
                min_size=4, max_size=8, unique=True))
@settings(deadline=None, max_examples=60)
def test_fix_ring_outputs_are_simple_or_original(pts):
    """The ladder's contract: fix_ring either returns simple sub-rings
    (iterated noding — float-epsilon vertex clusters can need a second
    pass) or falls back to the ORIGINAL ring unchanged; never a
    half-fixed non-simple output."""
    ring = np.array(list(pts) + [list(pts[0])], dtype=np.float64)
    parts = G.fix_ring(ring)
    if len(parts) == 1 and np.array_equal(parts[0], ring):
        return  # passthrough (simple input, or honest give-up)
    for p in parts:
        assert G.ring_is_simple(p)


@given(st.integers(min_value=4, max_value=24),
       st.integers(min_value=2, max_value=5),
       st.integers(min_value=0, max_value=1000))
@settings(deadline=None, max_examples=60)
def test_line_merge_reassembles_split_ring(n, k, seed):
    """Splitting a simple ring into k contiguous open pieces and
    line_merging them back yields ONE closed ring carrying the same
    vertex set — the multipolygon-assembly precondition for split
    member ways."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    ring = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    closed = np.vstack([ring, ring[:1]])
    k = min(k, n - 1)
    cuts = sorted(rng.choice(np.arange(1, n), size=k - 1, replace=False)) \
        if k > 1 else []
    pieces = []
    prev = 0
    for c in list(cuts) + [n]:
        pieces.append(closed[prev:c + 1])
        prev = c
    merged = G.line_merge(pieces)
    assert len(merged) == 1
    m = merged[0]
    assert G.is_closed_ring(m)
    assert {tuple(p) for p in m} == {tuple(p) for p in closed}


@given(st.integers(min_value=1, max_value=4),
       st.integers(min_value=0, max_value=99))
@settings(deadline=None, max_examples=40)
def test_wkb_multipolygon_roundtrip(n_polys, seed):
    rng = np.random.default_rng(seed)
    polys = []
    for i in range(n_polys):
        cx, cy = rng.uniform(-50, 50, 2)
        shell = np.array([[cx - 1, cy - 1], [cx + 1, cy - 1],
                          [cx + 1, cy + 1], [cx - 1, cy + 1],
                          [cx - 1, cy - 1]])
        rings = [shell]
        if i % 2 == 0:
            hole = shell * 0.5 + np.array([cx, cy]) * 0.5
            rings.append(hole[::-1])
        polys.append(rings)
    buf = G.wkb_multipolygon(polys)
    t, parsed = G.parse_wkb(buf)
    assert t == G.WKB_MULTIPOLYGON and len(parsed) == n_polys
    for orig, back in zip(polys, parsed):
        assert len(orig) == len(back)
        for r0, r1 in zip(orig, back):
            assert np.allclose(r0, r1)


# --------------------------------------------------------------------------
# Z-order (Morton) layout kernels — sources/layout.py
# --------------------------------------------------------------------------

from pyrosm_spark.sources import layout as L  # noqa: E402


@given(lons, lats, st.integers(min_value=0, max_value=tiles.MAX_RES))
def test_morton_is_bit_interleave_of_grid_indices(lon, lat, res):
    """morton_py == the naive bit-by-bit interleave of (x, y)."""
    n = 1 << res
    x = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
    y = min(n - 1, max(0, int((lat + 90.0) / 180.0 * n)))
    naive = 0
    for b in range(res):
        naive |= ((x >> b) & 1) << (2 * b + 1)
        naive |= ((y >> b) & 1) << (2 * b)
    z = L.morton_py(lon, lat, res)
    assert z == naive
    assert 0 <= z < (1 << (2 * res))


@given(lons, lats,
       st.integers(min_value=0, max_value=tiles.MAX_RES),
       st.integers(min_value=0, max_value=tiles.MAX_RES))
def test_cell_morton_range_covers_the_points_key(lon, lat, pres, kres):
    """Every point's key at resolution kres falls inside the Morton
    window of its own ancestor cell at any coarser resolution pres."""
    if pres > kres:
        pres, kres = kres, pres
    cell = tiles.encode_py(lon, lat, pres)
    lo, hi = L.cell_morton_range_py(cell, kres)
    z = L.morton_py(lon, lat, kres)
    assert lo <= z <= hi


@given(st.lists(st.tuples(lons, lats), min_size=1, max_size=8),
       st.tuples(lons, lons), st.tuples(lats, lats),
       st.integers(min_value=1, max_value=tiles.MAX_RES))
def test_bbox_morton_ranges_complete_and_sorted(points, lon_pair,
                                                lat_pair, res):
    """Ranges returned for a bbox are sorted, disjoint, and contain the
    key of every point inside the bbox (completeness — false positives
    are allowed, the exact filter removes them; false negatives never)."""
    x0, x1 = sorted(lon_pair)
    y0, y1 = sorted(lat_pair)
    ranges = L.bbox_morton_ranges_py((x0, y0, x1, y1), res)
    assert ranges == sorted(ranges)
    for (l0, h0), (l1, h1) in zip(ranges, ranges[1:]):
        assert h0 < l1  # merged: disjoint, non-adjacent
    for lon, lat in points:
        if x0 <= lon <= x1 and y0 <= lat <= y1:
            z = L.morton_py(lon, lat, res)
            assert any(lo <= z <= hi for lo, hi in ranges), (lon, lat)
