"""Contract tests for the way-WKB kernel, called directly (no Spark).

Round-3 regression: a snapshot commit left a stale ``valid[i]`` read in
``_way_wkb_from_arrays`` after its definition was deleted, so every
invocation raised NameError — but no test called the kernel function
itself, only layer queries whose plans sometimes pruned it.  These
tests pin the raw numpy-kernel contract (reference parity:
geometry.pyx:404-620 create_way_geometries) and run in well under 5 s
with no SparkSession.
"""
import struct

import numpy as np
import pandas as pd
import pytest

from pyrosm_spark.operators.geometry import _way_wkb_from_arrays

KERNEL = _way_wkb_from_arrays.func

WKB_LINESTRING = 2
WKB_POLYGON = 3


def _arr(*vals):
    return np.asarray(vals, dtype=np.float64)


def _call(rows):
    """rows: list of (lons_or_None, lats_or_None, is_polygon)."""
    lons = pd.Series([r[0] for r in rows], dtype=object)
    lats = pd.Series([r[1] for r in rows], dtype=object)
    poly = pd.Series([r[2] for r in rows])
    out = KERNEL(lons, lats, poly)
    assert len(out) == len(rows)
    return list(out)


def _parse_header(wkb):
    byte_order, geom_type = struct.unpack_from("<BI", wkb, 0)
    assert byte_order == 1
    return geom_type


def test_all_valid_linestrings_and_polygons():
    sq_lon, sq_lat = _arr(0, 1, 1, 0, 0), _arr(0, 0, 1, 1, 0)
    out = _call([
        (_arr(0, 1, 2), _arr(0, 0, 1), False),   # open linestring
        (sq_lon, sq_lat, True),                   # closed square polygon
        (_arr(5, 6), _arr(5, 5), False),          # 2-point linestring
    ])
    assert all(o is not None for o in out)
    assert _parse_header(out[0]) == WKB_LINESTRING
    assert _parse_header(out[1]) == WKB_POLYGON
    assert _parse_header(out[2]) == WKB_LINESTRING
    # linestring body: npts then coord pairs
    npts = struct.unpack_from("<I", out[0], 5)[0]
    assert npts == 3
    coords = np.frombuffer(out[0][9:], dtype="<f8").reshape(-1, 2)
    np.testing.assert_array_equal(coords[:, 0], [0, 1, 2])
    np.testing.assert_array_equal(coords[:, 1], [0, 0, 1])


def test_polygon_ring_is_ccw_and_closed():
    # clockwise input square: kernel must reverse to CCW
    cw_lon, cw_lat = _arr(0, 0, 1, 1, 0), _arr(0, 1, 1, 0, 0)
    out = _call([(cw_lon, cw_lat, True)])
    wkb = out[0]
    nrings = struct.unpack_from("<I", wkb, 5)[0]
    assert nrings == 1
    npts = struct.unpack_from("<I", wkb, 9)[0]
    ring = np.frombuffer(wkb[13:], dtype="<f8").reshape(-1, 2)
    assert len(ring) == npts
    np.testing.assert_array_equal(ring[0], ring[-1])  # closed
    x, y = ring[:, 0], ring[:, 1]
    area2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
    assert area2 > 0  # CCW


def test_unclosed_polygon_gets_closure_vertex():
    out = _call([(_arr(0, 2, 2, 0), _arr(0, 0, 2, 2), True)])
    wkb = out[0]
    npts = struct.unpack_from("<I", wkb, 9)[0]
    assert npts == 5  # 4 stored + synthesized closure
    ring = np.frombuffer(wkb[13:], dtype="<f8").reshape(-1, 2)
    np.testing.assert_array_equal(ring[0], ring[-1])


@pytest.mark.parametrize("pos", ["head", "middle", "tail"])
def test_none_and_short_rows_yield_none_in_place(pos):
    good = (_arr(0, 1, 2), _arr(0, 0, 1), False)
    bad_rows = [
        (None, None, False),                 # NULL arrays
        (_arr(7.0), _arr(7.0), False),       # 1 point — too short
        (_arr(), _arr(), True),              # empty arrays
    ]
    for bad in bad_rows:
        if pos == "head":
            rows = [bad, good, good]
            bad_idx = [0]
        elif pos == "middle":
            rows = [good, bad, good]
            bad_idx = [1]
        else:
            rows = [good, good, bad]
            bad_idx = [2]
        out = _call(rows)
        for i, o in enumerate(out):
            if i in bad_idx:
                assert o is None
            else:
                assert o is not None and _parse_header(o) == WKB_LINESTRING


def test_all_rows_short_or_null():
    out = _call([(None, None, False), (_arr(1.0), _arr(1.0), True)])
    assert out == [None, None]


def test_degenerate_polygon_dropped_but_line_kept():
    # all-identical vertices: polygon -> None, linestring -> built
    same = (_arr(3, 3, 3), _arr(4, 4, 4))
    out = _call([(same[0], same[1], True), (same[0], same[1], False)])
    assert out[0] is None
    assert out[1] is not None and _parse_header(out[1]) == WKB_LINESTRING


def test_closed_three_point_sliver_polygon_is_built():
    # [A, B, A] — reference's GEOS constructor builds these (goldens
    # count them); kernel pads the ring to 4 points
    out = _call([(_arr(0, 1, 0), _arr(0, 1, 0), True)])
    wkb = out[0]
    assert wkb is not None and _parse_header(wkb) == WKB_POLYGON
    npts = struct.unpack_from("<I", wkb, 9)[0]
    assert npts >= 4


def test_empty_batch():
    out = KERNEL(pd.Series([], dtype=object), pd.Series([], dtype=object),
                 pd.Series([], dtype=bool))
    assert len(out) == 0


def test_mixed_large_batch_roundtrip():
    rng = np.random.RandomState(42)
    rows, expect_none = [], []
    for i in range(500):
        kind = i % 5
        if kind == 0:
            rows.append((None, None, False))
            expect_none.append(True)
        elif kind == 1:
            rows.append((_arr(float(i)), _arr(float(i)), True))
            expect_none.append(True)
        else:
            n = 2 + (i % 7)
            lon = rng.uniform(-10, 10, n)
            lat = rng.uniform(-10, 10, n)
            poly = kind == 4
            if poly:
                lon = np.append(lon, lon[0])
                lat = np.append(lat, lat[0])
            rows.append((lon, lat, poly))
            expect_none.append(False)
    out = _call(rows)
    for o, none_ok, r in zip(out, expect_none, rows):
        if none_ok:
            assert o is None
        else:
            # closed random rings can be degenerate only if all points
            # equal — impossible here, so everything builds
            assert o is not None
            want = WKB_POLYGON if r[2] else WKB_LINESTRING
            assert _parse_header(o) == want
