"""Vectorized geometry kernels (numpy-only; no GEOS in this container).

These are the batch kernels the engine's pandas UDFs call per Arrow
batch. They rebuild the geometry semantics pyrosm gets from shapely:

* WKB writers/readers (pyrosm round-trips geometry as WKB in GeoParquet,
  ``engine/geoparquet.py:104``) — our geometry column is WKB binary
* ring stitching = shapely ``line_merge`` as used by multipolygon
  assembly (``geometry.pyx:195-240``)
* even-odd ring overlay = the reduce(symmetric_difference) in
  ``geometry.pyx:228-236``: a point is inside iff covered by an odd
  number of rings; for non-crossing rings (OSM multipolygons) this is
  exactly containment-depth parity, which is what we compute
* ray-casting point-in-polygon (vectorized over point arrays) — the
  exact-refine step of the spatial joins (``frames.pyx:231-241`` J10)
* RHR orientation normalize (``geometry.pyx:17-24`` G8)

Everything operates on float64 lon/lat arrays; geometries are
represented as numpy (n,2) coordinate arrays between kernels and only
serialized to WKB at the column boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# WKB geometry type codes (OGC, little-endian byte order marker 1)
WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6


# --------------------------------------------------------------------------
# WKB writers
# --------------------------------------------------------------------------

def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, lon, lat)


def _coords_bytes(coords: np.ndarray) -> bytes:
    c = np.ascontiguousarray(coords, dtype="<f8")
    return struct.pack("<I", len(c)) + c.tobytes()


def wkb_linestring(coords: np.ndarray) -> bytes:
    return struct.pack("<BI", 1, WKB_LINESTRING) + _coords_bytes(coords)


def wkb_polygon(rings: list) -> bytes:
    """rings[0] = shell, rest = holes; each an (n,2) closed coord array."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    out += [_coords_bytes(r) for r in rings]
    return b"".join(out)


def wkb_multilinestring(lines: list) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTILINESTRING, len(lines))]
    out += [wkb_linestring(l) for l in lines]
    return b"".join(out)


def wkb_multipolygon(polygons: list) -> bytes:
    """polygons: list of ring-lists."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polygons))]
    out += [wkb_polygon(rings) for rings in polygons]
    return b"".join(out)


# --------------------------------------------------------------------------
# WKB reader (tests + PIP refine over stored polygons)
# --------------------------------------------------------------------------

def parse_wkb(buf: bytes):
    """Return (type_code, payload):

    point -> (lon, lat); linestring -> (n,2) array;
    polygon -> [rings]; multilinestring -> [arrays];
    multipolygon -> [[rings], ...].
    """
    geom, _ = _parse_wkb_at(buf, 0)
    return geom


def _parse_wkb_at(buf: bytes, off: int):
    byte_order, gtype = struct.unpack_from("<BI", buf, off)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    off += 5
    if gtype == WKB_POINT:
        lon, lat = struct.unpack_from("<dd", buf, off)
        return (WKB_POINT, (lon, lat)), off + 16
    if gtype == WKB_LINESTRING:
        coords, off = _read_coords(buf, off)
        return (WKB_LINESTRING, coords), off
    if gtype == WKB_POLYGON:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(n):
            coords, off = _read_coords(buf, off)
            rings.append(coords)
        return (WKB_POLYGON, rings), off
    if gtype in (WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            sub, off = _parse_wkb_at(buf, off)
            parts.append(sub[1])
        return (gtype, parts), off
    raise ValueError(f"unsupported WKB type {gtype}")


def _read_coords(buf: bytes, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    coords = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return coords.copy(), off + 16 * n


# --------------------------------------------------------------------------
# Ring / polygon math
# --------------------------------------------------------------------------

def signed_area(coords: np.ndarray) -> float:
    """Shoelace signed area in coordinate units; >0 = CCW."""
    x, y = coords[:, 0], coords[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def orient_ring(coords: np.ndarray, ccw: bool) -> np.ndarray:
    """Return ring oriented CCW (ccw=True) or CW — RHR normalize
    (geometry.pyx:17-24: exterior CCW, holes CW)."""
    if (signed_area(coords) > 0) != ccw:
        return coords[::-1].copy()
    return coords


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: for each point, whether it lies
    inside ``ring`` ((n,2), closed or open — treated cyclically).

    Boundary points follow the usual half-open convention (stable, but
    boundary hits are measure-zero for our synthetic data).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx, ry = ring[:, 0], ring[:, 1]
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    n = len(rx)
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(n):  # loop over ring edges (small), vectorized over points
        xi, yi, xj, yj = x1[i], y1[i], x2[i], y2[i]
        cond = (yi > py) != (yj > py)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= cond & (px < xcross)
    return inside


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: list
) -> np.ndarray:
    """Inside shell and not inside any hole (even-odd over all rings)."""
    inside = np.zeros(np.asarray(px).shape, dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    return inside


def _on_ring_boundary(px: np.ndarray, py: np.ndarray,
                      ring: np.ndarray) -> np.ndarray:
    """Boolean per point: lies exactly on a vertex or edge of ``ring``
    (exact float arithmetic — OSM touching is shared-node touching, so
    coincident coordinates are bit-equal)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx, ry = ring[:, 0], ring[:, 1]
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    on = np.zeros(px.shape, dtype=bool)
    for i in range(len(rx)):
        xi, yi, xj, yj = x1[i], y1[i], x2[i], y2[i]
        cross = (xj - xi) * (py - yi) - (yj - yi) * (px - xi)
        within = (
            (px >= min(xi, xj)) & (px <= max(xi, xj))
            & (py >= min(yi, yj)) & (py <= max(yi, yj))
        )
        on |= (cross == 0.0) & within
    return on


def ring_contains_ring(outer: np.ndarray, inner: np.ndarray) -> bool:
    """Non-crossing-ring containment via one representative point of
    ``inner`` — robust to legal OSM touching (an inner ring sharing
    nodes/edges with the outer): the half-open ray cast classifies
    boundary points arbitrarily, so the representative must lie OFF
    the outer boundary. Fast path: the first vertex, when clear of the
    boundary; else the first clear vertex, then the first clear edge
    midpoint; fully coincident rings count as not contained."""
    pts = inner
    if pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]:
        pts = pts[:-1]
    if not _on_ring_boundary(pts[:1, 0], pts[:1, 1], outer)[0]:
        return bool(points_in_ring(pts[:1, 0], pts[:1, 1], outer)[0])
    for cand in (pts, (pts + np.roll(pts, -1, axis=0)) / 2.0):
        on = _on_ring_boundary(cand[:, 0], cand[:, 1], outer)
        if not on.all():
            k = int(np.argmin(on))
            return bool(
                points_in_ring(cand[k:k + 1, 0], cand[k:k + 1, 1], outer)[0]
            )
    return False


# --------------------------------------------------------------------------
# Line merging / ring assembly (shapely.line_merge analogue)
# --------------------------------------------------------------------------

def _key(pt) -> tuple:
    return (float(pt[0]), float(pt[1]))


def line_merge(lines: list) -> list:
    """Stitch polylines sharing endpoints into maximal lines.

    Mirrors GEOS ``line_merge`` for the multipolygon-assembly use case
    (geometry.pyx:203): lines are joined only at endpoints where exactly
    two line-ends meet. Returns a list of (n,2) arrays; closed results
    have first == last vertex.
    """
    lines = [np.asarray(l, dtype=np.float64) for l in lines if len(l) >= 2]
    if not lines:
        return []
    # endpoint -> list of (line_idx, end) where end 0 = start, 1 = end
    endpoints: dict = {}
    for i, l in enumerate(lines):
        endpoints.setdefault(_key(l[0]), []).append((i, 0))
        endpoints.setdefault(_key(l[-1]), []).append((i, 1))

    used = [False] * len(lines)
    merged = []
    for i in range(len(lines)):
        if used[i]:
            continue
        used[i] = True
        chain = [lines[i]]
        # extend forward from the tail, then backward from the head
        for direction in (1, 0):
            while True:
                cur = chain[-1] if direction == 1 else chain[0]
                pt = _key(cur[-1]) if direction == 1 else _key(cur[0])
                cands = [(j, e) for (j, e) in endpoints.get(pt, []) if not used[j]]
                if len(endpoints.get(pt, ())) != 2 or len(cands) != 1:
                    break
                j, e = cands[0]
                nxt = lines[j]
                if direction == 1:
                    nxt = nxt if e == 0 else nxt[::-1]
                    chain.append(nxt[1:])
                else:
                    nxt = nxt if e == 1 else nxt[::-1]
                    chain.insert(0, nxt[:-1])
                used[j] = True
        merged.append(np.concatenate(chain, axis=0))
    return merged


def is_closed_ring(coords: np.ndarray) -> bool:
    return len(coords) >= 4 and bool(np.all(coords[0] == coords[-1]))


# --------------------------------------------------------------------------
# G7 — geometry fixing ladder (numpy bowtie polygonize)
# --------------------------------------------------------------------------
#
# Reference semantics (geometry.pyx:27-72 fix_geometry, applied to
# invalid relation geometry at geometry.pyx:215-217,238-239 and
# relations.pyx:170-175): try buffer(0), then self-intersect the
# exterior and polygonize, accepting a candidate only when
# abs(1 - area_orig/area_fixed) < 20. Without GEOS both repair stages
# collapse to one numpy equivalent: node the ring at its proper
# self-crossings and at repeated vertices, walk the noded cycle and
# emit every simple sub-ring (polygonize keeps BOTH bowtie lobes — the
# reference's stage-2 behavior; buffer(0)'s winding-sensitive lobe
# selection is not reproducible without GEOS), then apply the same
# area-ratio sanity gate. Unfixable rings pass through unchanged, as
# fix_geometry returns the original invalid geometry.

def ring_self_intersections(ring: np.ndarray):
    """Proper crossings between non-adjacent edges of a ring.

    ``ring`` open or closed; edges are cyclic. Returns a dict
    edge_index -> list of (t, (x, y)) with 0 < t < 1, where the
    crossing POINT object is shared by both edges involved so the
    noded walk sees bit-identical coordinates on both passes.
    """
    r = np.asarray(ring, dtype=np.float64)
    if is_closed_ring(r):
        r = r[:-1]
    n = len(r)
    if n < 4:
        return {}
    a = r
    b = np.roll(r, -1, axis=0)
    d = b - a  # edge vectors
    out: dict = {}
    j_idx = np.arange(n)
    # chunk the i axis: the dense n x n formulation allocates ~9
    # float64 arrays — 180 GB for a 50k-vertex coastline ring — so
    # memory must stay O(chunk * n) (full vectorization preserved
    # inside each block; results identical to the dense form)
    chunk = max(1, min(n, (1 << 22) // max(n, 1) or 1))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        i_idx = np.arange(s, e)
        # denom[i, j] = cross(d_i, d_j)
        denom = (d[s:e, 0][:, None] * d[None, :, 1]
                 - d[s:e, 1][:, None] * d[None, :, 0])
        dax = a[None, :, 0] - a[s:e, None, 0]  # a_j - a_i (x)
        day = a[None, :, 1] - a[s:e, None, 1]
        # over="ignore": near-parallel edges make denom tiny and t/u
        # huge; those are rejected by the 0<t<1 bounds below, so the
        # overflow is benign and must not warn from worker tasks
        with np.errstate(divide="ignore", invalid="ignore",
                         over="ignore"):
            t = (dax * d[None, :, 1] - day * d[None, :, 0]) / denom
            u = (dax * d[s:e, None, 1] - day * d[s:e, None, 0]) / denom
        ii = i_idx[:, None]
        adjacent = (
            (ii == j_idx[None, :])
            | ((ii + 1) % n == j_idx[None, :])
            | ((j_idx[None, :] + 1) % n == ii)
        )
        base = ~adjacent & (denom != 0) & (t > 0) & (t < 1)
        proper = base & (u > 0) & (u < 1) & (ii < j_idx[None, :])
        for bi, j in zip(*np.nonzero(proper)):
            i = int(i_idx[bi])
            px = float(a[i, 0] + t[bi, j] * d[i, 0])
            py = float(a[i, 1] + t[bi, j] * d[i, 1])
            pt = (px, py)
            out.setdefault(i, []).append((float(t[bi, j]), pt))
            out.setdefault(int(j), []).append((float(u[bi, j]), pt))
        # vertex-on-edge self-touch: a vertex of edge j (u exactly 0
        # or 1) lying in the INTERIOR of non-adjacent edge i. GEOS
        # calls such pinched rings invalid and the reference repairs
        # them (geometry.pyx buffer(0)); with only the strict-interior
        # bounds above they classified simple and passed through
        # unrepaired. Registered on edge i ONLY, and with the
        # VERTEX's exact coordinates (not the parametric point, which
        # can differ in the last ulp), so the noded walk revisits the
        # bit-identical point and pops the pinched lobe. No i<j
        # constraint: the roles are asymmetric, each ordered pair is
        # its own case.
        touch = base & ((u == 0) | (u == 1))
        for bi, j in zip(*np.nonzero(touch)):
            i = int(i_idx[bi])
            vj = int(j) if u[bi, j] == 0 else (int(j) + 1) % n
            pt = (float(a[vj, 0]), float(a[vj, 1]))
            out.setdefault(i, []).append((float(t[bi, j]), pt))
    return out


def ring_is_simple(ring: np.ndarray) -> bool:
    """No proper self-crossings and no repeated interior vertex."""
    r = np.asarray(ring, dtype=np.float64)
    if is_closed_ring(r):
        r = r[:-1]
    keys = {(_key(p)) for p in r}
    if len(keys) != len(r):
        return False
    return not ring_self_intersections(r)


def polygonize_ring(ring: np.ndarray) -> list:
    """Split a self-intersecting ring into simple sub-rings.

    Nodes the cyclic walk at proper crossings, then pops a sub-ring
    every time the walk revisits a point (which also handles
    self-touching rings that repeat a vertex without crossing edges).
    Returns open (no duplicate closing vertex) sub-rings with >= 3
    vertices; zero-area spikes are left to the caller's area filter.
    """
    r = np.asarray(ring, dtype=np.float64)
    if is_closed_ring(r):
        r = r[:-1]
    crossings = ring_self_intersections(r)
    walk = []
    for i in range(len(r)):
        walk.append((float(r[i, 0]), float(r[i, 1])))
        for _, pt in sorted(crossings.get(i, []), key=lambda x: x[0]):
            walk.append(pt)
    walk.append(walk[0])  # close the cycle

    stack: list = []
    index: dict = {}
    rings = []
    for p in walk:
        if p in index:
            start_i = index[p]
            loop = stack[start_i:]
            if len(loop) >= 3:
                rings.append(np.array(loop + [loop[0]], dtype=np.float64))
            for q in stack[start_i + 1:]:
                index.pop(q, None)
            stack = stack[:start_i + 1]
        else:
            index[p] = len(stack)
            stack.append(p)
    return rings


def fix_ring(ring: np.ndarray, diff_threshold: float = 20.0,
             max_rounds: int = 4) -> list:
    """G7 ladder for one closed ring: simple rings pass through; bowtie
    rings are polygonized, accepted under the reference's area-ratio
    sanity (abs(1 - A_orig/A_fixed) < diff_threshold, A_orig the NET
    shoelace area exactly as GEOS .area reports for an invalid bowtie,
    A_fixed the lobe-area sum); otherwise the original (still-invalid)
    ring passes through unchanged (fix_geometry's final fallback).

    Noding is iterated: float-epsilon vertex clusters can leave a
    residual crossing after one pass (the snap-rounding robustness
    case GEOS handles with noding validation), so non-simple sub-rings
    re-polygonize up to ``max_rounds`` times — in practice the
    residual is a zero-area sliver that the area filter drops. A part
    still non-simple after the rounds falls back to the original ring
    (never a silently half-fixed output)."""
    if ring_is_simple(ring):
        return [ring]
    parts = [p for p in polygonize_ring(ring) if abs(signed_area(p)) > 0.0]
    for _ in range(max_rounds):
        if all(ring_is_simple(p) for p in parts):
            break
        nxt = []
        for p in parts:
            if ring_is_simple(p):
                nxt.append(p)
            else:
                nxt.extend(q for q in polygonize_ring(p)
                           if abs(signed_area(q)) > 0.0)
        parts = nxt
    if not parts or not all(ring_is_simple(p) for p in parts):
        return [ring]
    a_orig = abs(signed_area(ring))
    a_fix = sum(abs(signed_area(p)) for p in parts)
    if a_fix == 0:
        return [ring]
    if abs(1.0 - a_orig / a_fix) < diff_threshold:
        return parts
    return [ring]


def _canonical_ring_key(r: np.ndarray) -> tuple:
    """Rotation- and direction-invariant identity of a ring: the
    lexicographically smallest rotation of its open vertex sequence,
    over both directions. Two member ways tracing the same ring —
    regardless of start vertex or winding — get the same key."""
    c = r[:-1] if is_closed_ring(r) else r
    pts = [(float(p[0]), float(p[1])) for p in c]

    def best(seq):
        k = min(range(len(seq)), key=lambda i: seq[i])
        return tuple(seq[k:] + seq[:k])

    return min(best(pts), best(list(reversed(pts))))


def assemble_multipolygon(member_lines: list):
    """OSM multipolygon assembly by geometry, not member role.

    Parity target: ``geometry.pyx:195-240`` —
      1. line_merge member ways, keep only closed rings (open rings are
         dropped, never force-closed);
      2. even-odd overlay: containment-depth parity classifies each ring
         as shell (even depth) or hole (odd depth), holes attached to
         their immediate parent shell. For the non-crossing rings of a
         valid OSM multipolygon this equals reduce(symmetric_difference).

    Returns list-of-polygons [[shell, hole, ...], ...] or None when no
    ring survives (the reference drops such relations).

    Invalid (self-intersecting / self-touching) rings go through the
    G7 fix ladder first (``fix_ring`` — the reference repairs invalid
    ring polygons and assembly output, geometry.pyx:215-217,238-239),
    so bowtie rings contribute their simple lobes to the overlay
    instead of silently passing a bad polygon through.
    """
    rings = [r for r in line_merge(member_lines) if is_closed_ring(r)]
    rings = [f for r in rings for f in fix_ring(r)]
    rings = [r for r in rings if abs(signed_area(r)) > 0.0]
    # XOR multiplicity of COINCIDENT rings (duplicated member geometry
    # in the source data): the reference's reduce(symmetric_difference)
    # cancels identical rings pairwise — ring XOR ring = empty — so an
    # even multiplicity contributes NOTHING and an odd one contributes
    # once. ring_contains_ring deliberately returns False for
    # coincident rings, so without this they'd all count depth 0 and
    # stack as duplicate shells, violating the even-odd contract.
    by_key: dict = {}
    for r in rings:
        by_key.setdefault(_canonical_ring_key(r), []).append(r)
    rings = [grp[0] for grp in by_key.values() if len(grp) % 2 == 1]
    if not rings:
        return None

    n = len(rings)
    # containment depth of each ring = number of other rings containing it
    depth = np.zeros(n, dtype=np.int64)
    parents: list = [[] for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i != j and ring_contains_ring(rings[j], rings[i]):
                depth[i] += 1
                parents[i].append(j)

    polygons = []
    shell_index = {}
    order = np.argsort(depth, kind="stable")
    for i in order:
        if depth[i] % 2 == 0:
            shell_index[i] = len(polygons)
            polygons.append([orient_ring(rings[i], ccw=True)])
    for i in order:
        if depth[i] % 2 == 1:
            # immediate parent = containing ring with depth == depth[i]-1
            parent = max(
                (j for j in parents[i] if depth[j] == depth[i] - 1),
                key=lambda j: depth[j],
                default=None,
            )
            if parent is not None and parent in shell_index:
                polygons[shell_index[parent]].append(orient_ring(rings[i], ccw=False))
    return polygons if polygons else None


# --------------------------------------------------------------------------
# Exact geometry-vs-rectangle intersection (J10/F12 final bbox refine)
# --------------------------------------------------------------------------

def _segments_intersect_rect(coords: np.ndarray, rect) -> bool:
    """Any polyline segment intersects the axis-aligned rect (vectorized
    Cohen-Sutherland outcode test + exact segment/edge checks)."""
    xmin, ymin, xmax, ymax = rect
    x, y = coords[:, 0], coords[:, 1]
    inside = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
    if inside.any():
        return True
    # outcodes per vertex
    code = (
        (x < xmin).astype(np.int8)
        | ((x > xmax).astype(np.int8) << 1)
        | ((y < ymin).astype(np.int8) << 2)
        | ((y > ymax).astype(np.int8) << 3)
    )
    a, b = code[:-1], code[1:]
    # segments trivially outside (share an outside halfplane) can't cross
    candidates = np.nonzero((a & b) == 0)[0]
    for i in candidates:
        if _segment_crosses_rect(coords[i], coords[i + 1], rect):
            return True
    return False


def _segment_crosses_rect(p, q, rect) -> bool:
    xmin, ymin, xmax, ymax = rect
    # Liang-Barsky clip
    dx, dy = q[0] - p[0], q[1] - p[1]
    t0, t1 = 0.0, 1.0
    for num, den in (
        (xmin - p[0], dx), (p[0] - xmax, -dx),
        (ymin - p[1], dy), (p[1] - ymax, -dy),
    ):
        if den == 0:
            if num > 0:
                return False
            continue
        t = num / den
        if den > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return False
    return True


def geometry_intersects_rect(wkb: bytes, rect) -> bool:
    """Exact geometry ∩ rect — the reference's final bbox spatial join
    (frames.pyx:231-241 does gpd.sjoin intersects vs the bbox polygon)."""
    gtype, payload = parse_wkb(wkb)
    xmin, ymin, xmax, ymax = rect
    if gtype == WKB_POINT:
        x, y = payload
        return xmin <= x <= xmax and ymin <= y <= ymax
    if gtype == WKB_LINESTRING:
        return _segments_intersect_rect(payload, rect)
    if gtype == WKB_MULTILINESTRING:
        return any(_segments_intersect_rect(c, rect) for c in payload)
    if gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
        ring_sets = [payload] if gtype == WKB_POLYGON else payload
        for rings in ring_sets:
            if any(_segments_intersect_rect(r, rect) for r in rings):
                return True
            # rect fully inside the polygon (no boundary crossing):
            # test one rect corner against the ring set
            if points_in_polygon(
                np.array([xmin]), np.array([ymin]), rings
            )[0]:
                return True
        return False
    raise ValueError(f"unsupported WKB type {gtype}")


# --------------------------------------------------------------------------
# numpy haversine (oracle/tests; the engine uses the SQL form)
# --------------------------------------------------------------------------

# single source of truth for the reference-parity radius
from pyrosm_spark.functions.distance import AVG_EARTH_RADIUS_M


def haversine_m_np(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    d = (
        np.sin((lat2 - lat1) * 0.5) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) * 0.5) ** 2
    )
    return 2.0 * AVG_EARTH_RADIUS_M * np.arcsin(np.sqrt(d))


def bbox_of_coords(coords: np.ndarray) -> tuple:
    return (
        float(coords[:, 0].min()),
        float(coords[:, 1].min()),
        float(coords[:, 0].max()),
        float(coords[:, 1].max()),
    )
