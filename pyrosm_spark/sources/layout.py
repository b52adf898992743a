"""Z-order (Morton) spatial data layout: clustered writes + pruned scans.

The reference never owns data layout — it re-parses the whole PBF for
every query and relies on its bbox filter to drop rows *after* decode
(``pyrosm/pbfreader.pyx:164-179``). At 10^12-row scale the dominant
cost is the scan itself, so the engine must be able to *lay data out*
so a spatial query never reads the 99.9% of row groups that cannot
match. This module provides the standard lakehouse answer (the
Databricks OPTIMIZE ZORDER / Iceberg sort-order pattern) from scratch:

* :func:`morton_key` — closed-form SQL Morton interleave of the quad
  grid's (x, y) indices (``functions/tiles.py`` scheme). Pure
  whole-stage-codegen arithmetic, no UDF; :func:`morton_key_sql` is
  the identical ANSI-SQL text so DuckDB oracles can reproduce keys
  bit-for-bit.
* :func:`write_spatial_clustered` — ``repartitionByRange`` on the
  Morton key + ``sortWithinPartitions``, so every output file covers a
  disjoint key range and every parquet row group carries tight
  min/max statistics on the key column.
* :func:`scan_spatial` — turns a bbox into a compacted set of cover
  cells, each cover cell into one *contiguous* Morton-range predicate
  (Z-order is hierarchical: all res-R descendants of a res-p cell
  share a 2p-bit prefix), merges adjacent ranges, and pushes the
  resulting OR-of-BETWEENs into the parquet scan. Catalyst turns each
  range into row-group-statistics pruning — on clustered data the
  scan touches only the row groups whose key window intersects the
  query, file- and row-group-level.

Why Morton and not the raw ``cell_id``: the raw encoding stores x and
y in separate bit fields, so spatially adjacent cells are up to 2^29
apart in key space and a bbox maps to O(height) disjoint stripes.
Bit interleave makes descendants of any quad cell a single contiguous
range, so a bbox compacts to a handful of BETWEENs regardless of
resolution.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrosm_spark.functions.tiles import (
    MAX_RES,
    bbox_cover_py,
    cell_x,
    cell_y,
    compact_py,
    decode_py,
    grid_x_py,
    grid_x_sql,
    grid_y_py,
    grid_y_sql,
)

# sidecar describing a clustered table's layout, written next to
# _SUCCESS — a scan at a different key resolution than the write would
# silently drop rows (the pushed ranges and the persisted keys would
# disagree), so the resolution is persisted and validated on read
_LAYOUT_META = "_zorder_layout.json"

# Classic part1by1 bit spread (even-bit positions), valid for inputs
# < 2^32 — grid indices are < 2^29. All masks are positive int64.
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_col(v: Column) -> Column:
    for shift, mask in _SPREAD_STEPS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def _spread_py(v: int) -> int:
    for shift, mask in _SPREAD_STEPS:
        v = (v | (v << shift)) & mask
    return v


def _spread_sql(expr: str) -> str:
    for shift, mask in _SPREAD_STEPS:
        expr = f"((({expr}) | (({expr}) << {shift})) & {mask})"
    return expr


def morton_key(lon: Column, lat: Column, res: int) -> Column:
    """int64 Morton (Z-order) key of the res-``res`` grid cell holding
    (lon, lat): x bits in even positions shifted up by one, y in even
    positions — ``z < 2**(2*res)``, always non-negative for
    ``res <= 29``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}]")
    zx = _spread_col(cell_x(lon, res))
    zy = _spread_col(cell_y(lat, res))
    return F.shiftleft(zx, 1).bitwiseOR(zy)


def morton_key_sql_from_xy(x_expr: str, y_expr: str) -> str:
    """Interleave two already-computed grid-index SQL expressions.
    Each spread step doubles the number of copies of its input text
    (32 copies after 5 steps), so callers embedding a heavy index
    expression should bind it to a short alias in a CTE first and pass
    the alias here — see ``_zorder_scan_sql`` in the entry module."""
    return f"((({_spread_sql(x_expr)}) << 1) | ({_spread_sql(y_expr)}))"


def morton_key_sql(lon: str, lat: str, res: int) -> str:
    """The identical key as ANSI SQL text (DuckDB mirror). The clamp
    formula is shared with ``tiles.cell_id_sql`` (``grid_*_sql``), so
    the two encodings cannot drift apart."""
    return morton_key_sql_from_xy(grid_x_sql(lon, res),
                                  grid_y_sql(lat, res))


def morton_py(lon: float, lat: float, res: int) -> int:
    """Driver-side mirror of :func:`morton_key` (shares the clamp with
    ``tiles.encode_py``)."""
    return ((_spread_py(grid_x_py(lon, res)) << 1)
            | _spread_py(grid_y_py(lat, res)))


def cell_morton_range_py(cell: int, res: int) -> tuple:
    """Inclusive (lo, hi) Morton-key window at resolution ``res`` of
    every descendant of ``cell`` (any resolution <= ``res``): Z-order
    is prefix-hierarchical, so the window is contiguous."""
    p, x, y = decode_py(cell)
    if p > res:
        raise ValueError(f"cover cell res {p} exceeds key res {res}")
    z = (_spread_py(x) << 1) | _spread_py(y)
    span = 2 * (res - p)
    return z << span, ((z + 1) << span) - 1


def _merge_ranges(ranges: list) -> list:
    """Coalesce overlapping/adjacent inclusive ranges (sorted by lo)."""
    out: list = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def bbox_morton_ranges_py(bbox: tuple, res: int,
                          max_ranges: int = 64) -> list:
    """Merged, inclusive Morton-key ranges at resolution ``res``
    covering every grid cell that intersects ``bbox`` (lon_min,
    lat_min, lon_max, lat_max).

    The cover resolution adapts: start from ``res`` and coarsen until
    the raw cover is small (cheap closed-form count — no enumeration),
    then compact full sibling blocks so large interiors collapse to
    single coarse ranges. Driver cost is O(cover size), bounded by
    ``max_ranges`` before the merge.
    """
    lon_min, lat_min, lon_max, lat_max = bbox
    cover_res = res
    while cover_res > 0:
        x0 = grid_x_py(lon_min, cover_res)
        x1 = grid_x_py(lon_max, cover_res)
        y0 = grid_y_py(lat_min, cover_res)
        y1 = grid_y_py(lat_max, cover_res)
        if (x1 - x0 + 1) * (y1 - y0 + 1) <= max_ranges:
            break
        cover_res -= 1
    cells = compact_py(bbox_cover_py(lon_min, lat_min,
                                     lon_max, lat_max, cover_res))
    return _merge_ranges([cell_morton_range_py(c, res) for c in cells])


def write_spatial_clustered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 15,
    key_col: str = "_zkey",
    num_files: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as parquet Z-order-clustered on (lon, lat).

    ``repartitionByRange`` gives each output file a disjoint key
    window; ``sortWithinPartitions`` makes every row group's min/max
    on ``key_col`` tight. The key column is persisted — it is what
    :func:`scan_spatial`'s pushed range predicates prune on (and it
    doubles as the res-``res`` cell identity for downstream tile
    work). On a real cluster the same two calls express the layout of
    a 10^12-row table: the exchange is one range shuffle, the sort is
    per-partition, nothing ever gathers to the driver.
    """
    meta = {"res": res, "key_col": key_col,
            "lon_col": lon_col, "lat_col": lat_col}
    if mode == "append":
        # an append at a different res would rewrite the sidecar and
        # re-label rows keyed at the OLD res — scan_spatial's pushed
        # Morton ranges would then silently miss them (the exact
        # silent-row-drop its res validation exists to prevent)
        prior = read_layout_meta(path)
        if prior is not None and prior != meta:
            raise ValueError(
                f"append layout {meta} != existing clustered layout "
                f"{prior} for {path}: appended keys would not match "
                f"the persisted sidecar and scans would drop rows")
    keyed = df.withColumn(key_col, morton_key(
        F.col(lon_col), F.col(lat_col), res))
    if num_files is None:
        num_files = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
    (keyed.repartitionByRange(num_files, F.col(key_col))
          .sortWithinPartitions(key_col)
          .write.mode(mode).parquet(path))
    with open(os.path.join(path, _LAYOUT_META), "w") as f:
        json.dump(meta, f)
    return path


def read_layout_meta(path: str) -> dict | None:
    p = os.path.join(path, _LAYOUT_META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def scan_spatial(
    spark: SparkSession,
    path: str,
    bbox: tuple | None = None,
    res: int | None = None,
    key_col: str = "_zkey",
    exact: bool = True,
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_ranges: int = 64,
) -> DataFrame:
    """Read a clustered table, pruning to the bbox via Morton ranges.

    The OR-of-BETWEENs on ``key_col`` reaches the parquet reader as
    pushed filters (int64 comparisons → row-group statistics skip);
    ``exact=True`` additionally applies the precise lon/lat window so
    results are independent of the cover's cell granularity.

    ``res`` defaults to the resolution recorded by
    :func:`write_spatial_clustered`'s sidecar; passing a value that
    contradicts the sidecar raises (the pushed ranges would disagree
    with the persisted keys and silently drop every row).
    """
    meta = read_layout_meta(path)
    if res is None:
        if meta is None:
            raise ValueError(
                f"{path} carries no layout sidecar; pass res= "
                f"explicitly (the resolution the table was written "
                f"with)")
        res = int(meta["res"])
    elif meta is not None and int(meta["res"]) != res:
        raise ValueError(
            f"scan res {res} != clustered write res {meta['res']} "
            f"for {path}: the pushed key ranges would not match the "
            f"persisted keys")
    df = spark.read.parquet(path)
    if bbox is None:
        return df
    ranges = bbox_morton_ranges_py(bbox, res, max_ranges=max_ranges)
    key = F.col(key_col)
    # an empty/inverted bbox covers no cells: the scan is empty, same
    # as the equivalent plain lon/lat filter
    cond = F.lit(False)
    for lo, hi in ranges:
        cond = cond | key.between(F.lit(lo), F.lit(hi))
    df = df.filter(cond)
    if exact:
        lon_min, lat_min, lon_max, lat_max = bbox
        df = df.filter(
            F.col(lon_col).between(lon_min, lon_max)
            & F.col(lat_col).between(lat_min, lat_max))
    return df


def matching_row_groups(path: str, ranges, key_col: str = "_zkey"):
    """(matched, total) row-group counts from the parquet footers:
    a group counts as matched when its ``key_col`` min/max window
    intersects any of the inclusive ``ranges`` — exactly the statistics
    the pushed BETWEENs prune on — or when it carries no usable
    min/max (the reader must touch it). Shared by the layout benchmark
    and the pruning tests so the measurement logic cannot drift."""
    import glob

    import pyarrow.parquet as pq

    total = matched = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.num_columns)}[key_col]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if (st is None or not st.has_min_max
                    or st.min is None or st.max is None):
                matched += 1
                continue
            if any(st.min <= hi and lo <= st.max for lo, hi in ranges):
                matched += 1
    return matched, total


# --------------------------------------------------------------------------
# Training-shard assignment: fixed-size, spatially-clustered shards
# --------------------------------------------------------------------------

def assign_shards(
    df: DataFrame,
    rows_per_shard: int,
    order_col: str = "_zkey",
    id_col: str = "image_id",
    n_buckets: int = 4096,
    shard_col: str = "shard",
    keep_bucket: bool = False,
) -> DataFrame:
    """Deterministic fixed-size shard ids over the total order
    (``order_col``, ``id_col``): row i of the ordering lands in shard
    ``i // rows_per_shard``. With a Morton ``order_col`` this is the
    training-data export layout a 10^12-image pipeline wants — every
    shard holds spatially-adjacent rows (co-located tiles decode
    together) and all shards except the last hold exactly
    ``rows_per_shard`` rows.

    Scale shape — a global ``row_number`` window would sort the corpus
    through ONE task; instead the order key's high bits split the data
    into ``<= n_buckets`` key-disjoint buckets (bucket order == key
    order by construction), so the global index decomposes into a
    per-bucket ``row_number`` (parallel windows, one per bucket) plus
    a per-bucket offset cumsum computed from the bucket histogram —
    metadata-sized (``n_buckets`` rows) on the driver, broadcast back.
    Two passes over the data (histogram + window) after a 2-value
    min/max agg, no single-task stage. Buckets split the OCCUPIED key
    span ``(key - min) >> shift`` — a regional corpus concentrates all
    keys under a shared high-bit prefix, so bucketing raw high bits
    would collapse every row into one bucket (one window task, the
    exact single-task sort this function exists to avoid). Bucket skew
    is bounded by the key granularity: raise ``n_buckets`` to shrink
    the largest window partition (rows sharing ONE key value are the
    irreducible floor — with a Morton key, one res-r cell).
    """
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be > 0, got {rows_per_shard}")
    from pyspark.sql import Window

    key = F.col(order_col)
    bounds = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    if bounds["lo"] is None:
        return df.withColumn(shard_col, F.lit(None).cast("long"))
    lo = int(bounds["lo"])
    span = int(bounds["hi"]) - lo + 1
    # ceil-log2 split of the span keeps buckets <= n_buckets while the
    # bucket id stays monotonic in the key (equal keys share a bucket,
    # so the id tiebreak never crosses buckets). Null order keys (e.g.
    # a null lon/lat row whose Morton key is null) go to bucket -1:
    # they sort FIRST, matching the window's ``key.asc()`` nulls-first
    # order, instead of crashing the histogram sort / silently falling
    # out of the inner join on "b".
    shift = max(0, span.bit_length() - max(1, n_buckets).bit_length() + 1)
    bucket = F.when(key.isNull(), F.lit(-1).cast("long")).otherwise(
        F.shiftright(key.cast("long") - F.lit(lo), shift))
    hist = df.select(bucket.alias("b")).groupBy("b").count().collect()
    offsets, acc = [], 0
    for r in sorted(hist, key=lambda r: r["b"]):
        offsets.append((int(r["b"]), acc))
        acc += r["count"]
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(offsets, "b long, off long"))
    w = Window.partitionBy("b").orderBy(key.asc(), F.col(id_col).asc())
    out = (
        df.withColumn("b", bucket)
        .withColumn("_rn", F.row_number().over(w) - 1)
        .join(off, "b")
        .withColumn(shard_col, ((F.col("off") + F.col("_rn"))
                                / rows_per_shard).cast("long"))
    )
    if keep_bucket:
        # diagnosis surface: lets tests assert the window actually
        # decomposed (a regional corpus must not collapse to 1 bucket)
        return out.withColumnRenamed("b", "_bucket").drop("_rn", "off")
    return out.drop("b", "_rn", "off")


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "image_id",
    res: int = 15,
    mode: str = "overwrite",
) -> str:
    """Materialize fixed-size spatially-clustered training shards:
    Morton-key the rows, assign shard ids (:func:`assign_shards`), and
    write parquet partitioned by shard — each ``shard=N/`` directory is
    one self-contained, spatially-coherent unit a dataloader can claim.
    """
    meta = {"res": res, "key_col": "_zkey", "lon_col": lon_col,
            "lat_col": lat_col, "rows_per_shard": rows_per_shard,
            "id_col": id_col}
    if mode == "append":
        prior = read_layout_meta(path)
        if prior is not None and prior != meta:
            raise ValueError(
                f"append shard layout {meta} != existing layout {prior} "
                f"for {path}")
    keyed = df.withColumn("_zkey", morton_key(
        F.col(lon_col), F.col(lat_col), res))
    sharded = assign_shards(keyed, rows_per_shard, "_zkey", id_col)
    (sharded.repartition("shard")
            .sortWithinPartitions("shard", "_zkey", id_col)
            .write.mode(mode).partitionBy("shard").parquet(path))
    with open(os.path.join(path, _LAYOUT_META), "w") as f:
        json.dump(meta, f)
    return path


def cluster_osm_dataset(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    res: int = 15,
    num_files: int | None = None,
) -> dict:
    """Rewrite an OSM element dataset with Z-order-clustered node
    tables — the lakehouse OPTIMIZE step for this engine's worlds.

    Every ``*.parquet`` table under ``src_dir`` that carries lon/lat
    columns (nodes, history nodes) is rewritten via
    :func:`write_spatial_clustered`; the others (ways, relations —
    no coordinates) pass through unchanged. Source columns are
    preserved (the clustered tables additionally carry the ``_zkey``
    sort column, which engine loads prune away), so
    ``load_osm(spark, out_dir)`` serves the identical
    element model — but now every bbox query's pushed lon/lat
    predicates land on tables whose row groups carry TIGHT coordinate
    min/max windows (clustering on the interleaved key bounds both
    axes at once), so the scan skips the row groups that cannot match
    without any query-side change. Returns {table: "clustered"|"copied"}.
    """
    import glob as _glob

    os.makedirs(out_dir, exist_ok=True)
    done = {}
    for p in sorted(_glob.glob(os.path.join(src_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(p))[0]
        df = spark.read.parquet(p)
        dst = os.path.join(out_dir, f"{name}.parquet")
        if "lon" in df.columns and "lat" in df.columns:
            write_spatial_clustered(df, dst, res=res,
                                    num_files=num_files)
            done[name] = "clustered"
        else:
            df.write.mode("overwrite").parquet(dst)
            done[name] = "copied"
    return done
