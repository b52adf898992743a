"""Network extraction: pyrosm ``get_network`` re-expressed as DataFrame ops.

Pipeline (SURVEY.md §3.1 'Spark shape'):
    ways -> filter expr (F2-F4 compiled)            [scan + codegen]
         -> node->way coordinate join (J1)          [2 shuffles]
         -> segment/way lengths (W2 + G10)          [pure SQL]
         -> WKB geometry pandas UDF (G2)            [Arrow batch]
         -> optional bbox semantics (J2/J9/J10)     [semi-joins]
         -> optional directed-edge generation (X1)  [union, no shuffle]

Reference entry point: ``pyrosm.py:314-497`` -> ``networks.py:6-56``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrosm_spark.functions.filters import (
    CompiledFilter,
    compile_custom_filter,
    element_filter_column,
)
from pyrosm_spark.operators import geometry as geom
from pyrosm_spark.operators.presets import (
    DIRECTION_SUFFIX,
    NETWORK_TAG_COLS,
    ONEWAY_AGAINST,
    ONEWAY_VALUES,
    network_filter,
)


def filter_network_ways(
    ways: DataFrame,
    network_type: str = "driving",
    custom_filter=None,
    filter_type: str | None = None,
) -> DataFrame:
    """Select network ways. Presets are EXCLUDE filters gated on the
    ``highway`` key (networks.py:21-33, filter_type='exclude',
    osm_keys='highway'); an advanced custom filter selects by its own
    positive keys with KEEP semantics; an explicit ``filter_type``
    overrides the default — a plain dict with ``filter_type='keep'``
    keeps exactly the listed highway values (pyrosm.py:409-429)."""
    network_filter(network_type)  # validates even with a custom filter
    #                               (pyrosm.py:443-445: network_type
    #                               still drives graph semantics)
    if custom_filter is not None:
        cf = compile_custom_filter(custom_filter)
        if filter_type is None:
            ftype = "keep" if isinstance(cf, CompiledFilter) else "exclude"
        else:
            ftype = filter_type.lower()
            if ftype not in ("keep", "exclude"):
                raise ValueError(
                    "'filter_type' -parameter should be either "
                    "'keep' or 'exclude'. ")
        osm_keys = None if isinstance(cf, CompiledFilter) else ["highway"]
        pred = element_filter_column(
            F.col("tags"), cf, osm_keys=osm_keys, filter_type=ftype
        )
    else:
        nf = network_filter(network_type)
        if nf is None:  # 'all'
            pred = element_filter_column(
                F.col("tags"), None, osm_keys=["highway"], filter_type="keep"
            )
        else:
            pred = element_filter_column(
                F.col("tags"), nf, osm_keys=["highway"], filter_type="exclude"
            )
    return ways.filter(pred)


# shared presentation-column materializer (functions/tags.py)
from pyrosm_spark.functions.tags import present_tags as _present_tags


def _segment_intersects_box(seg, bbox) -> F.Column:
    """True iff the 2-point segment intersects the closed axis-aligned
    rectangle (boundary touch counts, matching shapely ``intersects``
    in the reference's final sjoin, frames.pyx:231-240). Separating
    axes: (1) the segment's bbox overlaps the rectangle; (2) the four
    rectangle corners do not all lie strictly on one side of the
    segment's supporting line. Pure Column arithmetic — whole-stage
    codegen, no UDF."""
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    x1, y1 = seg["lon1"], seg["lat1"]
    x2, y2 = seg["lon2"], seg["lat2"]
    overlap = (
        (F.greatest(x1, x2) >= xmin) & (F.least(x1, x2) <= xmax)
        & (F.greatest(y1, y2) >= ymin) & (F.least(y1, y2) <= ymax)
    )
    dx, dy = x2 - x1, y2 - y1

    def cross(cx: float, cy: float) -> F.Column:
        return dx * (F.lit(cy) - y1) - dy * (F.lit(cx) - x1)

    c1, c2 = cross(xmin, ymin), cross(xmin, ymax)
    c3, c4 = cross(xmax, ymin), cross(xmax, ymax)
    same_side = ((c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)) | (
        (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0))
    return overlap & ~same_side


def get_network(
    nodes: DataFrame,
    ways: DataFrame,
    network_type: str = "driving",
    custom_filter=None,
    bbox: tuple | None = None,
    with_nodes: bool = False,
    tag_cols=NETWORK_TAG_COLS,
    filter_type: str | None = None,
    keep_refs: bool = False,
    keep_metadata: bool = True,
):
    """Edge list for a travel network.

    Returns ``edges`` (way-level rows: id, length, geometry WKB, tag
    columns) or, with ``with_nodes=True``, ``(nodes_df, edges_df)``
    where edges are segment-level with ``u``/``v``/``length`` and nodes
    are every endpoint referenced by a kept edge (J9 retention,
    frames.pyx:243-253).

    ``keep_metadata`` mirrors the reference's OSM(keep_metadata=...)
    on network frames (networks.py:17-20 appends timestamp/changeset/
    version to the column set only when keep_metadata): False drops
    the element metadata columns from edges and nodes.
    """
    meta_drop = ([] if keep_metadata
                 else ["version", "changeset", "timestamp"])
    w = filter_network_ways(ways, network_type, custom_filter, filter_type)

    if bbox is not None:
        w = ways_in_bbox(w, nodes, bbox)
    wf = w  # pre-geometry frame: cheap occurring-keys tag source

    w = geom.spread_for_udf(geom.way_coordinates(w, nodes))
    w = w.filter(geom.pts_size() >= 2)  # <2 resolvable refs -> dropped

    if not with_nodes:
        edges = (
            w.withColumn("length", geom.way_length_m())
            .withColumn(
                "geometry",
                geom.way_geometry_wkb(F.col(geom.PTS_FIELD), F.lit(False)),
            )
            .withColumn("osm_type", F.lit("way"))
        )
        edges = _present_tags(edges, tag_cols, tag_source=wf)
        # The reference's network frame carries version/timestamp but
        # never visible (its tests pin 19/21/22 columns; data_filter
        # treats visible as internal-only — it drives history/delete
        # filtering upstream, then leaves the presentation frame).
        # keep_refs mirrors OSM.keep_node_info (pyrosm.py:185,490).
        edges = edges.drop(geom.PTS_FIELD, "visible", *meta_drop)
        return (edges.withColumnRenamed("refs", "nodes")
                if keep_refs else edges.drop("refs"))

    # segment-level path (networks nodes=True; frames.pyx:79-99):
    # per-way consecutive pairs -> posexplode; no extra shuffle (W2 is
    # an array op on the already-assembled pts).
    p = F.col(geom.PTS_FIELD)
    seg_idx = F.sequence(F.lit(1), F.size(p) - 1)
    segs = F.transform(
        seg_idx,
        lambda i: F.struct(
            F.element_at(p, i)["ref"].alias("u"),
            F.element_at(p, i + 1)["ref"].alias("v"),
            F.element_at(p, i)["lon"].alias("lon1"),
            F.element_at(p, i)["lat"].alias("lat1"),
            F.element_at(p, i + 1)["lon"].alias("lon2"),
            F.element_at(p, i + 1)["lat"].alias("lat2"),
        ),
    )
    e = w.withColumn("seg", F.explode(segs))
    if bbox is not None:
        # F12 at segment level (frames.pyx:231-240 final sjoin): keep
        # only segments that INTERSECT the box — complete (not cut),
        # but a kept way's tail lying wholly outside the box is
        # dropped. Exact segment-vs-AABB test as pure Catalyst
        # arithmetic (bbox overlap + the rectangle's corners not all
        # strictly on one side of the segment's supporting line).
        e = e.filter(_segment_intersects_box(F.col("seg"), bbox))
    from pyrosm_spark.functions.distance import segment_length_m

    # version/timestamp ONLY — networks.py:17-20 requests changeset
    # too, but the reference's way records never carry it
    # (pbfreader.pyx parse_ways emits id/version/timestamp/visible/
    # tags/nodes), so reference network frames have no changeset
    # column; both our paths match that
    meta_keep = [c for c in ("version", "timestamp")
                 if keep_metadata and c in e.columns]
    refs_keep = ["refs"] if keep_refs else []
    edges = (
        e.select(
            "id", "tags", *meta_keep, *refs_keep,
            F.col("seg.u").alias("u"),
            F.col("seg.v").alias("v"),
            segment_length_m(
                F.col("seg.lat1"), F.col("seg.lon1"),
                F.col("seg.lat2"), F.col("seg.lon2"),
            ).alias("length"),
            geom.segment_geometry_wkb(
                F.col("seg.lon1"), F.col("seg.lat1"),
                F.col("seg.lon2"), F.col("seg.lat2"),
            ).alias("geometry"),
        )
        .withColumn("osm_type", F.lit("way"))
    )
    edges = _present_tags(edges, tag_cols, tag_source=wf)
    if keep_refs:
        # keep_node_info on the segment path too (pyrosm.py:490 drops
        # 'nodes' only when keep_node_info is False, nodes=True or not)
        edges = edges.withColumnRenamed("refs", "nodes")

    # J9: node frame keeps every id referenced by kept edges' u/v,
    # even outside a bbox (frames.pyx:243-253 regression #199).
    endpoint_ids = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
    )
    nodes_out = nodes.join(endpoint_ids, "id", "left_semi")
    nodes_out = nodes_out.withColumn(
        "geometry", geom.point_geometry_wkb(F.col("lon"), F.col("lat"))
    ).withColumn("osm_type", F.lit("node")).drop("visible", *meta_drop)
    return nodes_out, edges


def ways_in_bbox(ways: DataFrame, nodes: DataFrame, bbox: tuple) -> DataFrame:
    """J2 — complete-ways bbox semantics: keep a way iff >=1 of its refs
    is an in-box node (pbfreader.pyx:495-498, data_filter.pyx:208-217).
    The way's geometry still uses ALL its nodes (complete ways)."""
    xmin, ymin, xmax, ymax = bbox
    in_box = nodes.filter(
        F.col("lon").between(xmin, xmax) & F.col("lat").between(ymin, ymax)
    ).select(F.col("id").alias("ref"))
    refs = ways.select(F.col("id"), F.explode("refs").alias("ref"))
    keep_ids = refs.join(in_box, "ref", "left_semi").select("id").distinct()
    return ways.join(keep_ids, "id", "left_semi")


def directed_edges(
    edges: DataFrame,
    network_type: str = "driving",
    force_bidirectional: bool = False,
    from_col: str = "u",
    to_col: str = "v",
) -> DataFrame:
    """X1 — directed-edge generation (graph_export.pyx:239-299), pure
    DataFrame: oneway mask + flipped union, no UDF, no extra shuffle.

    Effective direction = ``oneway:<suffix>`` override where set (e.g.
    contraflow cycling), else ``oneway``; an edge is oneway when the
    effective direction is in ONEWAY_VALUES or junction=roundabout;
    '-1'/'T' flip u<->v; two-way edges are emitted in both directions.
    """
    def forward(df: DataFrame) -> DataFrame:
        return df.withColumn("reversed", F.lit(False))

    def flipped(df: DataFrame) -> DataFrame:
        # ``reversed`` marks u/v-swapped copies whose payload columns
        # (e.g. segment WKB) still carry the original orientation —
        # geometry consumers (W5 stitching) reverse on this flag.
        return df.withColumn("_tmp", F.col(from_col)).withColumn(
            from_col, F.col(to_col)
        ).withColumn(to_col, F.col("_tmp")).drop("_tmp").withColumn(
            "reversed", F.lit(True))

    if force_bidirectional:
        return forward(edges).unionByName(flipped(edges))

    # network_type validation upstream is case-insensitive, so the
    # suffix lookup must be too — 'Cycling' keeps contraflow handling
    suffix = DIRECTION_SUFFIX.get(str(network_type).lower().strip())
    base_dir = F.col("tags")["oneway"]
    eff = (
        F.coalesce(F.col("tags")[f"oneway:{suffix}"], base_dir)
        if suffix
        else base_dir
    )
    junction = F.col("tags")["junction"]
    oneway = F.coalesce(eff.isin(ONEWAY_VALUES), F.lit(False)) | F.coalesce(
        junction == "roundabout", F.lit(False)
    )
    against = F.coalesce(eff.isin(ONEWAY_AGAINST), F.lit(False))

    along = forward(edges.filter(oneway & ~against))
    against_df = flipped(edges.filter(oneway & against))
    twoway = edges.filter(~oneway)
    return along.unionByName(against_df).unionByName(forward(twoway)) \
        .unionByName(flipped(twoway))
