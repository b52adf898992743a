"""Hierarchical quad-tile cell index as pure Catalyst expressions.

The reference assigns geometry to space only via a bbox filter
(``pbfreader.pyx:164-179``) and a final polygon sjoin
(``frames.pyx:231-241``). At 10^12-row scale the engine instead needs a
discrete global grid for equi-join-able spatial operations (the
H3/S2 role in ``BASELINE.json``'s north rule). The container has no h3
wheel, so we use an equivalent hierarchical scheme with *closed-form SQL*
encoding — which has a major advantage at scale: cell assignment is pure
whole-stage-codegen arithmetic (no UDF at all) and the same formula runs
verbatim in DuckDB for oracle checks.

Scheme (resolution r in [0, 29]):
    x = clamp(floor((lon + 180) / 360 * 2^r), 0, 2^r - 1)
    y = clamp(floor((lat +  90) / 180 * 2^r), 0, 2^r - 1)
    cell_id = (r << 58) | (x << 29) | y        (fits int64, r <= 29)

Hierarchy: parent(cell) halves x and y — so compact/uncompact covers,
neighbor rings (kNN) and polyfill are integer arithmetic. Average cell
edge at r=15 is ~1.2 km in longitude at the equator, r=20 ~38 m.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RES = 29
_X_SHIFT = 29
_RES_SHIFT = 58
_COORD_MASK = (1 << _X_SHIFT) - 1


def _clamped_idx_dyn(coord: Column, offset: float, extent: float,
                     n: Column) -> Column:
    """Clamped grid index with a PER-ROW cell count ``n`` (= 2^res,
    long Column). The ONE clamped-index formula: ``cell_x``/``cell_y``
    (routing) and the dynamic-res cover explode both delegate here —
    bit-parity between the two is load-bearing (a polygon routed by
    ``cell_x`` must land in exactly the cells its cover emits)."""
    idx = F.floor((coord + F.lit(offset)) / F.lit(extent)
                  * n.cast("double"))
    return F.greatest(F.lit(0).cast("long"),
                      F.least(n - F.lit(1), idx.cast("long")))


def _clamped_idx(coord: Column, offset: float, extent: float, res: int) -> Column:
    return _clamped_idx_dyn(coord, offset, extent,
                            F.lit(1 << res).cast("long"))


def cell_x(lon: Column, res: int) -> Column:
    return _clamped_idx(lon, 180.0, 360.0, res)


def cell_y(lat: Column, res: int) -> Column:
    return _clamped_idx(lat, 90.0, 180.0, res)


def cell_id(lon: Column, lat: Column, res: int) -> Column:
    """Encode (lon, lat) -> int64 cell id at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}]")
    return (
        F.lit(res << _RES_SHIFT).cast("long")
        + F.shiftleft(cell_x(lon, res), _X_SHIFT)
        + cell_y(lat, res)
    )


def cell_res(cell: Column) -> Column:
    return F.shiftrightunsigned(cell, _RES_SHIFT).cast("int")


def cell_xy(cell: Column) -> tuple:
    x = F.shiftrightunsigned(cell, _X_SHIFT).bitwiseAND(F.lit(_COORD_MASK))
    y = cell.bitwiseAND(F.lit(_COORD_MASK))
    return x, y


def cell_parent(cell: Column, parent_res: int, child_res: int) -> Column:
    """Ancestor cell at ``parent_res`` (compact step of a cover)."""
    if parent_res > child_res:
        raise ValueError("parent_res must be <= child_res")
    shift = child_res - parent_res
    x, y = cell_xy(cell)
    return (
        F.lit(parent_res << _RES_SHIFT).cast("long")
        + F.shiftleft(F.shiftrightunsigned(x, shift), _X_SHIFT)
        + F.shiftrightunsigned(y, shift)
    )


def grid_x_sql(lon: str, res: int) -> str:
    """Clamped grid x index as ANSI SQL (the single source of the
    clamp formula — bit-parity with :func:`cell_x` / :func:`grid_x_py`
    depends on every mirror delegating here)."""
    n = 1 << res
    return (
        f"GREATEST(0, LEAST({n - 1}, "
        f"CAST(FLOOR(({lon} + 180.0) / 360.0 * {float(n)}) AS BIGINT)))"
    )


def grid_y_sql(lat: str, res: int) -> str:
    n = 1 << res
    return (
        f"GREATEST(0, LEAST({n - 1}, "
        f"CAST(FLOOR(({lat} + 90.0) / 180.0 * {float(n)}) AS BIGINT)))"
    )


def cell_id_sql(lon: str, lat: str, res: int) -> str:
    """The identical encoding as ANSI SQL text (DuckDB oracle)."""
    return (
        f"(CAST({res} AS BIGINT) * {1 << _RES_SHIFT} "
        f"+ {grid_x_sql(lon, res)} * {1 << _X_SHIFT} "
        f"+ {grid_y_sql(lat, res)})"
    )


# --------------------------------------------------------------------------
# Driver-side cell math (cover enumeration, neighbor rings). These run on
# small metadata (polygon bboxes, hot-cell lists), never per data row.
# --------------------------------------------------------------------------

def grid_x_py(lon: float, res: int) -> int:
    """Driver-side mirror of :func:`cell_x` / :func:`grid_x_sql`."""
    n = 1 << res
    return min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))


def grid_y_py(lat: float, res: int) -> int:
    n = 1 << res
    return min(n - 1, max(0, int((lat + 90.0) / 180.0 * n)))


def encode_py(lon: float, lat: float, res: int) -> int:
    return ((res << _RES_SHIFT)
            + (grid_x_py(lon, res) << _X_SHIFT)
            + grid_y_py(lat, res))


def decode_py(cell: int) -> tuple:
    """cell -> (res, x, y)."""
    return cell >> _RES_SHIFT, (cell >> _X_SHIFT) & _COORD_MASK, cell & _COORD_MASK


def cell_bounds_py(cell: int) -> tuple:
    """cell -> (lon_min, lat_min, lon_max, lat_max)."""
    res, x, y = decode_py(cell)
    n = 1 << res
    lon_min = x / n * 360.0 - 180.0
    lat_min = y / n * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / n, lat_min + 180.0 / n


def bbox_cover_py(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, res: int
) -> list:
    """All cells at ``res`` intersecting the bbox (polyfill building block)."""
    x0 = grid_x_py(lon_min, res)
    x1 = grid_x_py(lon_max, res)
    y0 = grid_y_py(lat_min, res)
    y1 = grid_y_py(lat_max, res)
    base = res << _RES_SHIFT
    return [
        base + (x << _X_SHIFT) + y
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    ]


def neighbors_py(cell: int, ring: int = 1) -> list:
    """The (2*ring+1)^2 block of cells centered on ``cell`` (incl. itself),
    clamped at the grid edge — the kNN neighbor-ring expansion."""
    res, x, y = decode_py(cell)
    n = 1 << res
    base = res << _RES_SHIFT
    out = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            nx, ny = x + dx, y + dy
            if 0 <= nx < n and 0 <= ny < n:
                out.append(base + (nx << _X_SHIFT) + ny)
    return out


def compact_py(cells: list) -> list:
    """Replace any complete set of 4 siblings by their parent, recursively
    (the H3 'compact' analogue) — minimizes cover size for broadcast."""
    cells = set(cells)
    changed = True
    while changed:
        changed = False
        by_parent: dict = {}
        for c in cells:
            res, x, y = decode_py(c)
            if res == 0:
                continue
            p = ((res - 1) << _RES_SHIFT) + ((x >> 1) << _X_SHIFT) + (y >> 1)
            by_parent.setdefault(p, set()).add(c)
        for p, kids in by_parent.items():
            if len(kids) == 4 and kids <= cells:
                cells -= kids
                cells.add(p)
                changed = True
    return sorted(cells)


def uncompact_py(cells: list, res: int) -> list:
    """Expand a compacted cover back to uniform resolution ``res``."""
    out = []
    for c in cells:
        r, x, y = decode_py(c)
        if r > res:
            raise ValueError("cannot uncompact to a coarser resolution")
        shift = res - r
        base = res << _RES_SHIFT
        for dx in range(1 << shift):
            for dy in range(1 << shift):
                out.append(base + (((x << shift) + dx) << _X_SHIFT) + (y << shift) + dy)
    return sorted(set(out))
