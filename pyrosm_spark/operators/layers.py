"""Feature-layer queries: buildings / POIs / landuse / natural /
boundaries / custom criteria.

Reference entry points: ``buildings.py`` / ``pois.py`` / ``landuse.py``
/ ``natural.py`` / ``boundary.py`` / ``user_defined.py`` — all funnel
into the same (filter, assemble, union) lifecycle (SURVEY.md §3.1).
Spark shape per layer:

    relations ⟵filter           ways ⟵filter        nodes ⟵filter
        │ explode members (J3)      │ anti-join member ids (J4)
        │ member-way coord join     │ coord join (J1) + G4 typing
        │ multipolygon UDF (G6)     │ WKB UDF (G2/G3)
        └──────────────┬────────────┴──────── union ──── nodes (G1)
                       └ unionByName(allowMissingColumns=True) (U1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrosm_spark.functions.filters import (
    element_filter_column,
    ensure_filter_key,
)
from pyrosm_spark.operators import geometry as geom
from pyrosm_spark.operators import presets
from pyrosm_spark.operators.network import ways_in_bbox
from pyrosm_spark.operators.relations import (
    assemble_relations,
    relation_member_ways,
)


# shared presentation-column materializer (functions/tags.py) — the
# reference's buildings golden test expects ~20 columns from a 37-key
# candidate list; it too decides columns from the parsed tag arrays
# BEFORE geometry creation.
from pyrosm_spark.functions.tags import present_tags as _present_tags


def get_layer(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    custom_filter=None,
    filter_type: str = "keep",
    keep_all: bool = False,
    include_nodes: bool = True,
    include_ways: bool = True,
    include_relations: bool = True,
    bbox: tuple | None = None,
    complete_relations: bool = False,
    tag_cols=(),
    osm_keys=None,
    keep_metadata: bool = True,
    keep_refs: bool = False,
) -> DataFrame:
    """Generic layer query (get_data_by_custom_criteria equivalent,
    pyrosm.py:1027-1185). Returns a unioned feature DataFrame with
    ``osm_type`` in {node, way, relation}, WKB ``geometry``, the tags
    map, and presentation tag columns. ``osm_keys`` is the reference's
    ``osm_keys_to_keep`` candidate gate: an element must carry at least
    one of these keys regardless of the value filter.

    ``keep_metadata`` (reference default True — its golden frames carry
    ``version``/``timestamp``/``changeset``): False drops the element
    metadata columns, True keeps them on every part (``visible`` is
    dropped either way: post-filter it is identically true).

    ``include_ways=False`` (the reference's ``keep_ways=False``,
    pyrosm.py:1019-1185) skips the standalone-way pipeline ENTIRELY —
    no node-coordinate join, no geometry UDF, and way tags stay out of
    the occurring-keys scan (so way-only presentation columns never
    appear, matching the reference). Relation assembly still reads the
    way table internally for member geometry."""
    if not (include_nodes or include_ways or include_relations):
        raise ValueError(
            "at least one of include_nodes/include_ways/"
            "include_relations must be True")
    pred = element_filter_column(
        F.col("tags"), custom_filter, osm_keys=osm_keys,
        filter_type=filter_type, keep_all=keep_all,
    )
    meta_drop = (["visible"] if keep_metadata
                 else ["version", "changeset", "timestamp", "visible"])

    kept_ways = ways.filter(pred)
    parts = []
    tag_sources = []  # pre-geometry tags for the occurring-keys scan

    # --- relations (multipolygons etc.) --------------------------------
    member_ids = None
    in_box_way_ids = None
    if include_relations:
        kept_rels = relations.filter(pred)
        if bbox is not None:
            # In-box way ids computed ONCE over the full way table and
            # reused for the relation restriction here and the
            # standalone-way cut below (one explode cascade, not two).
            in_box_way_ids = ways_in_bbox(ways, nodes, bbox).select("id")
            # collect.py:606-614: with a bbox, a relation survives only
            # with >=1 member way in the box — REGARDLESS of
            # complete_relations (which only lifts the member-level
            # partial-geometry restriction). Restricting before the tag
            # scan also keeps out-of-box relations' tags from creating
            # spurious all-None presentation columns.
            present_rels = (
                relation_member_ways(kept_rels)
                .join(in_box_way_ids.withColumnRenamed("id", "way_id"),
                      "way_id", "left_semi")
                .select(F.col("rel_id").alias("id")).distinct()
            )
            kept_rels = kept_rels.join(present_rels, "id", "left_semi")
        tag_sources.append(kept_rels.select("tags"))
        member_ids = relation_member_ways(kept_rels).select(
            F.col("way_id").alias("id")
        ).distinct()
        # J6: unless complete_relations, member ways outside the bbox are
        # excluded from assembly (collect.py:616-623, partial geometry).
        restriction = None
        if bbox is not None and not complete_relations:
            restriction = in_box_way_ids
        rel_feats = assemble_relations(
            kept_rels, ways, nodes, member_way_restriction=restriction
        )
        parts.append(rel_feats.drop(*meta_drop))

    # --- standalone ways -------------------------------------------------
    if include_ways:
        if bbox is not None:
            if in_box_way_ids is not None:
                kept_ways = kept_ways.join(in_box_way_ids, "id", "left_semi")
            else:
                kept_ways = ways_in_bbox(kept_ways, nodes, bbox)
        if member_ids is not None:
            # J4: ways consumed by a kept relation leave the standalone
            # output
            kept_ways = kept_ways.join(member_ids, "id", "left_anti")
        tag_sources.append(kept_ways.select("tags"))
        w = geom.spread_for_udf(geom.way_coordinates(kept_ways, nodes))
        w = w.filter(geom.pts_size() >= 2)
        w = w.withColumn(
            "_poly",
            geom.way_is_closed() & geom.closed_way_is_polygon(F.col("tags")),
        )
        w = w.withColumn(
            "geometry",
            geom.way_geometry_wkb(F.col(geom.PTS_FIELD), F.col("_poly"))
        )
        way_feats = (
            w.filter(F.col("geometry").isNotNull())
            .withColumn("osm_type", F.lit("way"))
            .drop(geom.PTS_FIELD, "_poly", *meta_drop)
        )
        # keep_refs = the reference's OSM.keep_node_info: way features
        # expose their ref list as a 'nodes' column (pyrosm.py:185,583)
        way_feats = (way_feats.withColumnRenamed("refs", "nodes")
                     if keep_refs else way_feats.drop("refs"))
        parts.append(way_feats)

    # --- node features ----------------------------------------------------
    if include_nodes:
        kept_nodes = nodes.filter(pred)
        if bbox is not None:
            xmin, ymin, xmax, ymax = bbox
            kept_nodes = kept_nodes.filter(
                F.col("lon").between(xmin, xmax)
                & F.col("lat").between(ymin, ymax)
            )
        tag_sources.append(kept_nodes.select("tags"))
        node_feats = (
            kept_nodes.withColumn(
                "geometry",
                geom.point_geometry_wkb(F.col("lon"), F.col("lat")),
            )
            .withColumn("osm_type", F.lit("node"))
            .drop(*meta_drop)
        )
        parts.append(node_feats)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)  # U1
    src = tag_sources[0]
    for s in tag_sources[1:]:
        src = src.unionAll(s)
    return _present_tags(out, tag_cols, tag_source=src)


# --------------------------------------------------------------------------
# Named layers (thin preset wrappers, mirroring the reference modules)
# --------------------------------------------------------------------------

def get_buildings(nodes, ways, relations, custom_filter=None, bbox=None,
                  tag_cols=None, **kw) -> DataFrame:
    """buildings.py:20-27: default {'building': True}, keep, no node
    features; a custom filter is OR-extended with the building key."""
    cf = {"building": True} if custom_filter is None else ensure_filter_key(
        custom_filter, "building"
    )
    return get_layer(nodes, ways, relations, cf, include_nodes=False,
                     bbox=bbox, tag_cols=(presets.BUILDING_TAG_COLS if tag_cols is None
                               else tag_cols), **kw)


def get_pois(nodes, ways, relations, custom_filter=None, bbox=None,
             tag_cols=None, **kw) -> DataFrame:
    """pois.py:20-36: user filter, keep, node features included. The
    reference's default POI filter is Conf-driven; ours defaults to
    amenity/shop/tourism presence."""
    cf = custom_filter or {"amenity": True, "shop": True, "tourism": True}
    return get_layer(nodes, ways, relations, cf, include_nodes=True,
                     bbox=bbox, tag_cols=(presets.POI_TAG_COLS if tag_cols is None
                               else tag_cols), **kw)


def get_landuse(nodes, ways, relations, custom_filter=None, bbox=None,
                tag_cols=None, **kw) -> DataFrame:
    cf = {"landuse": True} if custom_filter is None else ensure_filter_key(
        custom_filter, "landuse"
    )
    return get_layer(nodes, ways, relations, cf, include_nodes=True,
                     bbox=bbox, tag_cols=(presets.LANDUSE_TAG_COLS if tag_cols is None
                               else tag_cols), **kw)


def get_natural(nodes, ways, relations, custom_filter=None, bbox=None,
                tag_cols=None, **kw) -> DataFrame:
    cf = {"natural": True} if custom_filter is None else ensure_filter_key(
        custom_filter, "natural"
    )
    return get_layer(nodes, ways, relations, cf, include_nodes=True,
                     bbox=bbox, tag_cols=(presets.NATURAL_TAG_COLS if tag_cols is None
                               else tag_cols), **kw)


def get_boundaries(nodes, ways, relations, boundary_type: str = "administrative",
                   name: str | None = None, custom_filter=None, bbox=None,
                   tag_cols=None, **kw) -> DataFrame:
    """boundary.py:20-85: default {'boundary': [type]} (or True for
    'all'), keep, no node features, then regex name filter (F10 —
    boundary.py:79 is pandas ``str.contains`` with its regex=True
    default, so 'Uusimaa|Helsinki' alternation must work)."""
    if custom_filter is None:
        custom_filter = {
            "boundary": True if boundary_type == "all" else [boundary_type]
        }
    cf = ensure_filter_key(custom_filter, "boundary")
    out = get_layer(nodes, ways, relations, cf, include_nodes=False,
                    bbox=bbox, tag_cols=(presets.BOUNDARY_TAG_COLS
                                         if tag_cols is None else tag_cols),
                    **kw)
    if name is not None:
        out = out.filter(
            F.col("tags")["name"].isNotNull()
            & F.col("tags")["name"].rlike(name)
        )
    return out
