"""GeoParquet 1.0 sink/reader (S8).

The reference emits GeoParquet through geopandas' arrow writer
(``engine/geoparquet.py`` via ``_geopandas_to_arrow(geometry_encoding=
"WKB")``); this module produces the same on-disk contract from a Spark
DataFrame whose geometry column is WKB ``BinaryType``:

1. the frame is written as ordinary parquet by Spark (distributed);
2. each part file's footer gains the GeoParquet ``geo`` key-value
   metadata (version / primary_column / encoding / geometry_types /
   bbox per the 1.0.0 spec, CRS omitted = OGC:CRS84 default).

The stamping pass is a per-file map with no cross-file dependency —
driver-side here (local volumes), a flat file-parallel job at cluster
scale; the expensive part (computing bbox + occurring geometry types)
runs distributed BEFORE the write as one native aggregation over the
WKB header bytes, never in Python.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEOPARQUET_VERSION = "1.0.0"

_TYPE_NAMES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}


def _geometry_stats(df: DataFrame, geometry_col: str):
    """(geometry_types, bbox) in one distributed aggregation: the WKB
    type code is byte 2 of the little-endian header (all our codes
    < 256, so the low byte IS the code — native substring + hex, no
    UDF); the bbox unions the per-feature bbox struct."""
    from pyrosm_spark.operators.spatial_join import wkb_bbox

    g = F.col(geometry_col)
    typ = F.conv(F.hex(F.expr(f"substring({geometry_col}, 2, 1)")), 16, 10)
    src = df.filter(g.isNotNull()).withColumn(
        "_b", wkb_bbox(g)).withColumn("_t", typ.cast("int"))
    row = src.agg(
        F.collect_set("_t").alias("types"),
        F.min("_b.xmin").alias("xmin"), F.min("_b.ymin").alias("ymin"),
        F.max("_b.xmax").alias("xmax"), F.max("_b.ymax").alias("ymax"),
    ).collect()[0]
    names = sorted(_TYPE_NAMES.get(t, f"Unknown({t})")
                   for t in (row["types"] or []))
    bbox = None
    if row["xmin"] is not None:
        bbox = [row["xmin"], row["ymin"], row["xmax"], row["ymax"]]
    return names, bbox


def geo_metadata(geometry_col: str = "geometry",
                 geometry_types: Sequence[str] = (),
                 bbox: Sequence[float] | None = None) -> dict:
    """The ``geo`` footer value per the GeoParquet 1.0.0 spec (CRS
    omitted = the spec's OGC:CRS84 default, matching our lon/lat)."""
    col: dict = {
        "encoding": "WKB",
        "geometry_types": list(geometry_types),
    }
    if bbox is not None:
        col["bbox"] = list(bbox)
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": geometry_col,
        "columns": {geometry_col: col},
    }


def _stamp_file(path: str, geo: dict) -> None:
    table = pq.read_table(path)
    meta = dict(table.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo).encode()
    pq.write_table(table.replace_schema_metadata(meta), path)
    # the rewrite invalidates Hadoop's local-FS checksum sidecar —
    # drop it so Spark can re-read the stamped file
    crc = os.path.join(os.path.dirname(path),
                       f".{os.path.basename(path)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> dict:
    """Write ``df`` as GeoParquet; returns the ``geo`` metadata dict
    that was stamped into the part files written by THIS call.

    With ``mode='append'`` only the newly written part files are
    stamped (with stats of the appended batch): pre-existing files keep
    their own footers, so an earlier write's bbox/geometry_types are
    never overwritten with stats they don't describe. Footer metadata
    is therefore per-write-batch, not whole-dataset — readers that
    need dataset-level bounds must union the per-file footers (the
    GeoParquet spec's own reading rule for multi-file datasets)."""
    if geometry_col not in df.columns:
        raise ValueError(f"no geometry column {geometry_col!r} in "
                         f"{df.columns}")
    types, bbox = _geometry_stats(df, geometry_col)
    geo = geo_metadata(geometry_col, types, bbox)
    pre_existing: set = set()
    if mode == "append" and os.path.isdir(path):
        pre_existing = {
            os.path.join(r, f)
            for r, _d, fs in os.walk(path) for f in fs
            if f.endswith(".parquet")}
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".parquet") and p not in pre_existing:
                _stamp_file(p, geo)
    return geo


def read_geo_metadata(path: str) -> dict | None:
    """Parse the ``geo`` footer of (the first part file of) a
    GeoParquet dataset; None when absent."""
    target = path
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
        if not parts:
            return None
        target = parts[0]
    meta = pq.read_schema(target).metadata or {}
    raw = meta.get(b"geo")
    return json.loads(raw.decode()) if raw else None


def read_geoparquet(spark: SparkSession, path: str) -> DataFrame:
    """GeoParquet reads as plain parquet (WKB geometry column); the
    footer metadata is advisory for interop tools."""
    return spark.read.parquet(path)
