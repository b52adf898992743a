"""GeoDataFrame-style edit write-back: the reference's full ``write_pbf``
workflow (S11) as distributed DataFrame transformations.

Semantics mirror ``pbf_writer.py:179-480`` + ``pyrosm.py:1286-1355`` of the
reference: each row of a feature frame updates the TAGS of the matching base
element (by ``osm_type`` + ``id``); rows whose id is absent from the base
become NEW elements synthesized from their geometry — ``Point`` → node,
``LineString`` → way, hole-less ``Polygon`` → closed way (anything else
raises). Synthesized elements get fresh NEGATIVE ids below the base minimum,
coincident vertices of new geometries share one synthesized node
(coordinates keyed at 1e-7 degrees, the PBF's native granularity), and a
tagged Point landing on a shared vertex attaches its tags to that node.
``subset_only=True`` writes only the matched elements plus the references
they need to stay valid (relations pull member ways/nodes to a fixed point
through sub-relations, ways pull their node refs) — ``pbf_writer.py:202-248``.

Spark shape: classification and tag application are joins; vertex dedup is a
distinct + window over the NEW coordinates only (edit sets are the small
side by construction — the base tables never pass through a window);
coordinate extraction from WKB is one Arrow-batched UDF over new rows only.
Deviations from the reference, documented: synthesized ids are assigned in a
deterministic sort order (coordinate key / row position) rather than Python
insertion order — the contract (unique, negative, below base min, deduped)
is identical; and where the reference stamps ``time.time()`` on synthesized
elements, ``now_ts`` is an explicit parameter (default 0) so output bytes
stay deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyrosm_spark.functions import geometry_np as G

# frame columns that are never tags (the reference's special-column skip
# list in _row_tags, pbf_writer.py:72-96, extended with this engine's
# derived columns)
_RESERVED = {
    "id", "osm_type", "geometry", "bbox", "lon", "lat", "u", "v",
    "length", "refs", "nodes", "members", "version", "timestamp",
    "changeset", "visible", "n_tags", "n_refs", "is_closed", "pts",
    "n_pts", "cell", "tags",
}


def _render_tag_value(fld: T.StructField) -> F.Column:
    """The reference's ``_tag_str`` rendering per column type
    (pbf_writer.py:50-59): booleans become the OSM strings 'yes'/'no';
    floats render integral values WITHOUT the '.0' (the headline
    ``edges["maxspeed"] = edges["maxspeed"].fillna(50)`` float column
    must write '50', not '50.0'); NaN is missing (pbf_writer.py:41-47
    ``_is_missing``), never the literal string 'NaN'. Exponent
    formatting of extreme doubles differs between str(float) and
    Spark's cast (1e-7 vs 1.0E-7) — out of contract for tag values."""
    v = F.col(fld.name)
    if isinstance(fld.dataType, T.BooleanType):
        return F.when(v, F.lit("yes")).when(~v, F.lit("no"))
    if isinstance(fld.dataType, (T.DoubleType, T.FloatType)):
        d = v.cast("double")
        as_long = d.try_cast("long")
        return F.when(F.isnan(d), F.lit(None).cast("string")).otherwise(
            F.when((d == F.floor(d)) & as_long.isNotNull()
                   & (as_long.cast("double") == d),
                   as_long.cast("string"))
            .otherwise(d.cast("string")))
    return v.cast("string")


def _tags_from_columns(data: DataFrame) -> F.Column:
    """Tag map from a feature frame: every non-reserved column rendered
    with the reference's ``_tag_str`` rules (see
    :func:`_render_tag_value`; null/NaN skipped per ``_is_missing``,
    empty strings KEPT — the reference keeps them too), merged OVER the
    frame's ``tags`` MapType column when one exists. The reference's
    feature frames materialize every tag as a column, so a user edit
    lands in the column — it must win over the stale map entry (the
    headline ``edges["maxspeed"] = ...; osm.write_pbf(edges, ...)``
    workflow). v1 limitation (same as the reference's edit model): tags
    can be added/changed, not deleted."""
    keys, vals = [], []
    for fld in data.schema.fields:
        if fld.name in _RESERVED or fld.name.startswith("_"):
            continue
        keys.append(F.lit(fld.name))
        vals.append(_render_tag_value(fld))
    overlay = None
    if keys:
        m = F.map_from_arrays(F.array(*keys), F.array(*vals))
        overlay = F.map_filter(m, lambda k, v: v.isNotNull())
    base = None
    if "tags" in data.columns and isinstance(
            data.schema["tags"].dataType, T.MapType):
        base = F.col("tags").cast("map<string,string>")
    if base is None and overlay is None:
        return F.lit(None).cast("map<string,string>")
    if base is None:
        return overlay
    if overlay is None:
        return base
    merged = F.map_zip_with(
        F.coalesce(base, F.expr("map()")),
        overlay, lambda k, v1, v2: F.coalesce(v2, v1))
    return F.when(base.isNull() & (F.size(overlay) == 0),
                  F.lit(None).cast("map<string,string>")
                  ).otherwise(merged)


@F.pandas_udf(T.StructType([
    T.StructField("gtype", T.IntegerType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
    T.StructField("err", T.StringType()),
]))
def _wkb_coords(geometry: pd.Series) -> pd.DataFrame:
    """Coordinates of a synthesizable geometry: Point / LineString /
    hole-less Polygon (exterior ring). Unsupported shapes return an
    ``err`` that the caller raises natively — the reference's
    add_geometry ValueErrors (pbf_writer.py:325-348)."""
    rows = []
    for buf in geometry:
        if buf is None or len(bytes(buf)) == 0:
            rows.append((None, None, None,
                         "has no (or empty) geometry to synthesize from"))
            continue
        gtype, payload = G.parse_wkb(bytes(buf))
        xs = ys = None
        if gtype == G.WKB_POINT:
            x, y = payload
            xs, ys = [float(x)], [float(y)]
        elif gtype == G.WKB_LINESTRING:
            xs = [float(c) for c in payload[:, 0]]
            ys = [float(c) for c in payload[:, 1]]
        elif gtype == G.WKB_POLYGON and len(payload) == 1:
            ring = payload[0]
            xs = [float(c) for c in ring[:, 0]]
            ys = [float(c) for c in ring[:, 1]]
        if xs is not None:
            if not xs:
                # empty LineString / empty exterior ring: all() over []
                # is vacuously True and posexplode would then emit zero
                # rows — a silent drop; raise like the reference's
                # geom.is_empty check (pbf_writer.py:325-330)
                rows.append((None, None, None,
                             "has no (or empty) geometry to synthesize "
                             "from"))
            elif all(-180.0 <= x <= 180.0 for x in xs) and all(
                    -90.0 <= y <= 90.0 for y in ys):
                rows.append((gtype, xs, ys, None))
            else:  # _check_lonlat (pbf_writer.py:254-260)
                rows.append((None, None, None,
                             "has coordinates outside valid lon/lat "
                             "ranges; new geometries must be in "
                             "EPSG:4326"))
        else:
            name = {G.WKB_POLYGON: "Polygon-with-holes",
                    G.WKB_MULTILINESTRING: "MultiLineString",
                    G.WKB_MULTIPOLYGON: "MultiPolygon"}.get(
                        gtype, f"wkb type {gtype}")
            rows.append((None, None, None,
                         f"cannot synthesize a new element from geometry "
                         f"type '{name}'; only Point, LineString and "
                         f"hole-less Polygon are supported"))
    return pd.DataFrame(rows, columns=["gtype", "xs", "ys", "err"])


def _min_id(df: DataFrame) -> int:
    v = df.agg(F.min("id")).collect()[0][0]
    return int(v) if v is not None else 0


def _last_wins_edits(d: DataFrame) -> DataFrame:
    """(id, _etags) with the LAST frame row winning on duplicate ids.

    'Last' means last in the frame's COLLECT order (partition-major
    ``_pos`` from monotonically_increasing_id, frozen by the caller's
    localCheckpoint) — the Spark analogue of the reference iterating
    pandas rows in order (pbf_writer._collect_edits). For a frame whose
    plan ends in a scan or a deterministic sort this equals the order
    the user sees; a frame ending in a shuffle has no defined row order
    in ANY engine — callers who care which duplicate wins should
    ``orderBy`` before passing the frame in."""
    w = Window.partitionBy("id").orderBy(F.col("_pos").desc())
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).select("id", "_etags"))


def _apply_tag_edits(base: DataFrame, edits: DataFrame) -> DataFrame:
    joined = base.join(_last_wins_edits(edits), "id", "left")
    return joined.withColumn(
        "tags", F.coalesce(F.col("_etags"), F.col("tags"))
    ).drop("_etags")


def apply_feature_edits(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    data: DataFrame,
    subset_only: bool = False,
    now_ts: int = 0,
):
    """Apply a feature frame's tag edits / new-feature rows to the base
    (nodes, ways, relations) and return the updated triple, ready for
    :func:`pyrosm_spark.sources.pbf.write_pbf`. See module docstring."""
    spark = data.sparkSession

    d = data
    if "id" not in d.columns:
        d = d.withColumn("id", F.lit(None).cast("long"))
    if "osm_type" not in d.columns:
        d = d.withColumn("osm_type", F.lit(None).cast("string"))
    if "geometry" not in d.columns:
        d = d.withColumn("geometry", F.lit(None).cast("binary"))
    # osm_type inference from the WKB type byte (little-endian writer:
    # byte 2 is the low byte of the geometry code) — _infer_osm_type
    # (pbf_writer.py): Point -> node, LineString/Polygon -> way,
    # anything else -> None. Multi* must NOT infer 'way': a
    # relation-sourced MultiPolygon whose id collides with a base way
    # id would silently edit that unrelated way; with None it routes to
    # the new-rows path, where _wkb_coords raises the reference's
    # cannot-synthesize ValueError.
    gcode = F.conv(F.hex(F.substring("geometry", 2, 1)), 16, 10).cast("int")
    d = d.select(
        F.col("id").cast("long").alias("id"),
        F.coalesce(
            F.lower(F.col("osm_type").cast("string")),
            F.when(gcode == G.WKB_POINT, "node")
            .when(gcode.isin(G.WKB_LINESTRING, G.WKB_POLYGON), "way"),
        ).alias("osm_type"),
        _tags_from_columns(d).alias("_etags"),
        F.col("geometry").cast("binary").alias("geometry"),
        F.monotonically_increasing_id().alias("_pos"),
    ).localCheckpoint()  # freeze _pos (row order) for last-wins rules

    base = {"node": nodes, "way": ways, "relation": relations}
    edits, news = {}, []
    for otype, b in base.items():
        dt = d.filter(F.col("osm_type") == otype)
        edits[otype] = dt.join(b.select("id"), "id", "left_semi")
        news.append(dt.join(b.select("id"), "id", "left_anti"))
    # rows whose type is null (no osm_type, no geometry) or not an OSM
    # element kind never match the base, so they are new rows — the
    # reference's _collect_edits else-branch (pbf_writer.py:186-198)
    # synthesizes them from geometry (or raises via add_geometry);
    # silent drops are never allowed
    news.append(d.filter(
        F.col("osm_type").isNull()
        | ~F.col("osm_type").isin("node", "way", "relation")))
    new_rows = news[0]
    for extra in news[1:]:
        new_rows = new_rows.unionByName(extra)

    out_nodes = _apply_tag_edits(nodes, edits["node"])
    out_ways = _apply_tag_edits(ways, edits["way"])
    out_rels = _apply_tag_edits(relations, edits["relation"])

    if subset_only:
        out_nodes, out_ways, out_rels = _subset_closure(
            out_nodes, out_ways, out_rels,
            edits["node"].select("id"),
            edits["way"].select("id"),
            edits["relation"].select("id"),
        )

    # ---- synthesis of new elements (pbf_writer.py:281-348) -------------
    if new_rows.limit(1).count() > 0:
        # one synthesis pass; reused by nodes + ways
        g = new_rows.withColumn("_g", _wkb_coords("geometry")) \
            .localCheckpoint()
        bad = (g.filter(F.col("_g.err").isNotNull())
               .select("id", F.col("_g.err").alias("err"))
               .limit(1).collect())
        if bad:
            raise ValueError(
                f"write_pbf: row id {bad[0]['id']} {bad[0]['err']}")

        pts = g.select(
            "_pos", "_etags", F.col("_g.gtype").alias("gtype"),
            F.posexplode(F.arrays_zip(F.col("_g.xs").alias("x"),
                                      F.col("_g.ys").alias("y"))),
        ).select(
            "_pos", "_etags", "gtype", "pos",
            F.col("col.x").alias("x"), F.col("col.y").alias("y"),
        )
        key = F.struct(
            F.round(F.col("y") * 1e7).cast("long").alias("ky"),
            F.round(F.col("x") * 1e7).cast("long").alias("kx"),
        )
        pts = pts.withColumn("ckey", key)

        node_floor = min(-1, _min_id(nodes) - 1)
        coords = pts.groupBy("ckey").agg(
            F.first("x").alias("x"), F.first("y").alias("y"))
        cw = Window.orderBy(F.col("ckey.ky"), F.col("ckey.kx"))
        coords = coords.withColumn(
            "nid", F.lit(node_floor) - F.row_number().over(cw) + 1)
        # tagged Points attach tags to their (possibly shared) node;
        # last frame row wins (pbf_writer.py:304-310)
        pt_tags = (
            pts.filter(F.col("gtype") == G.WKB_POINT)
            .withColumn("_rn", F.row_number().over(
                Window.partitionBy("ckey").orderBy(F.col("_pos").desc())))
            .filter(F.col("_rn") == 1).select("ckey", "_etags")
        )
        synth_nodes = (
            coords.join(pt_tags, "ckey", "left")
            .select(
                F.col("nid").alias("id"),
                F.col("x").alias("lon"), F.col("y").alias("lat"),
                F.col("_etags").alias("tags"),
                F.lit(1).alias("version"),
                F.lit(now_ts).cast("long").alias("timestamp"),
                F.lit(0).cast("long").alias("changeset"),
                F.lit(True).alias("visible"),
            )
        ).localCheckpoint()  # nid assignment is reused by the way refs

        way_floor = min(-1, _min_id(ways) - 1)
        way_rows = pts.filter(F.col("gtype") != G.WKB_POINT)
        ww = Window.orderBy("_pos")
        synth_ways = (
            way_rows.join(coords.select("ckey", "nid"), "ckey")
            .groupBy("_pos")
            .agg(
                F.first("_etags").alias("tags"),
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pos"), F.col("nid")))),
                    lambda s: s["nid"],
                ).alias("refs"),
            )
            .withColumn("id", F.lit(way_floor)
                        - F.row_number().over(ww) + 1)
            .select(
                "id", "refs", "tags",
                F.lit(1).alias("version"),
                F.lit(now_ts).cast("long").alias("timestamp"),
                F.lit(0).cast("long").alias("changeset"),
                F.lit(True).alias("visible"),
            )
        )
        out_nodes = out_nodes.unionByName(synth_nodes,
                                          allowMissingColumns=True)
        out_ways = out_ways.unionByName(synth_ways,
                                        allowMissingColumns=True)

    return out_nodes, out_ways, out_rels


def _subset_closure(nodes, ways, relations, keep_node_ids, keep_way_ids,
                    keep_rel_ids, max_depth: int = 10):
    """Reference closure of matched elements (pbf_writer.py:202-248):
    kept relations add member ways/nodes (iterating into cache-present
    sub-relations to a fixed point, super-relation nesting is shallow),
    then kept ways add their node refs. Semi-joins only."""
    keep_rels = keep_rel_ids.localCheckpoint()
    for _ in range(max_depth):
        subrels = (
            relations.join(keep_rels, "id", "left_semi")
            .select(F.explode("members").alias("m"))
            .filter(F.col("m.member_type") == "relation")
            .select(F.col("m.member_id").alias("id"))
            .join(relations.select("id"), "id", "left_semi")
            .join(keep_rels, "id", "left_anti")
            .distinct().localCheckpoint()
        )
        if subrels.limit(1).count() == 0:
            break
        keep_rels = keep_rels.unionByName(subrels).localCheckpoint()

    rel_members = (
        relations.join(keep_rels, "id", "left_semi")
        .select(F.explode("members").alias("m"))
    )
    keep_ways = (
        keep_way_ids.unionByName(
            rel_members.filter(F.col("m.member_type") == "way")
            .select(F.col("m.member_id").alias("id")))
        .distinct()
    )
    way_refs = (
        ways.join(keep_ways, "id", "left_semi")
        .select(F.explode("refs").alias("id"))
    )
    keep_nodes = (
        keep_node_ids
        .unionByName(rel_members.filter(F.col("m.member_type") == "node")
                     .select(F.col("m.member_id").alias("id")))
        .unionByName(way_refs)
        .distinct()
    )
    return (
        nodes.join(keep_nodes, "id", "left_semi"),
        ways.join(keep_ways, "id", "left_semi"),
        relations.join(keep_rels, "id", "left_semi"),
    )


def write_pbf_with_edits(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    data: DataFrame,
    path: str,
    subset_only: bool = False,
    now_ts: int = 0,
    block_size: int = 8000,
) -> dict:
    """The reference's ``OSM.write_pbf(data, path, subset_only)``
    (pyrosm.py:1286-1355): apply ``data``'s edits/additions to the base
    triple and emit a valid, re-readable ``.osm.pbf``."""
    from pyrosm_spark.sources.pbf import write_pbf

    n2, w2, r2 = apply_feature_edits(
        nodes, ways, relations, data, subset_only=subset_only,
        now_ts=now_ts)
    return write_pbf(n2, w2, r2, path, block_size=block_size)
