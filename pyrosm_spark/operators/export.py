"""X4 — graph-object exporters (reference: graph_export.pyx:29-236,
graphs.py:133-411).

The distributed export surface of this engine is the `(nodes, edges)`
DataFrame pair — that is what survives 100 TB. A NetworkX graph is a
driver-side object by definition, so this exporter mirrors the
reference's role exactly: a terminal convenience that collects the
(already filtered / directed / component-pruned) frames and assembles
the `MultiDiGraph` for interop with the OSMnx ecosystem. All graph
ALGORITHMS (street_count, degrees, components, simplification) run
distributed in `operators/graph.py`; nothing here is on a scale path.

Parity notes vs the reference:
- edges whose endpoint node records are missing are skipped, not an
  error (graph_export.pyx:148-172 — cropped-data tolerance);
- nodes are keyed by the node id column, attrs = full node record
  (graph_export.pyx:139-145);
- `osmnx_compatible=True` renames id->osmid, lon->x, lat->y and adds
  the `key` edge attribute (graphs.py:225-231);
- per-node `street_count` counts undirected incident street-segment
  endpoints (self-loop edges deduped, both their endpoints counted —
  graph_export.pyx:12-27), recomputed on the exported graph so it
  reflects the final edge set.
"""

from __future__ import annotations

from collections import Counter
from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAPH_NAME = "pyrosm_spark export"


def _street_counts(graph) -> dict:
    """OSMnx-compatible street_count: undirected incident segments per
    node; the self-loop EDGE is deduped to one but contributes both its
    endpoints, i.e. +2 to its node (graph_export.pyx:12-27 — same
    semantics as the distributed graph.street_count)."""
    import networkx as nx

    und = graph.to_undirected(reciprocal=False, as_view=True)
    self_loops = set(nx.selfloop_edges(und, keys=False))
    non_self = [e for e in und.edges(keys=False) if e not in self_loops]
    counts = Counter(chain.from_iterable(non_self + list(self_loops)))
    return {n: counts[n] for n in graph.nodes()}


def prepare_graph_frames(
    nodes: DataFrame,
    edges: DataFrame,
    network_type: str = "driving",
    force_bidirectional: bool = False,
    retain_all: bool = False,
    already_directed: bool = False,
    simplify: bool = False,
    simplify_kwargs: dict | None = None,
    from_col: str = "u",
    to_col: str = "v",
    node_id_col: str = "id",
):
    """Shared distributed prep for every exporter (graphs.py:133-411
    runs the same pipeline before each backend): directed-edge
    generation (X1), largest-SCC retention (X3, unless ``retain_all``),
    optional simplification (X2), endpoint-node retention (J9).
    Collects ONLY the final frames; returns
    (nodes_pdf, edges_pdf, from_col, to_col)."""
    from pyrosm_spark.operators.graph import largest_component_edges
    from pyrosm_spark.operators.network import directed_edges

    if not already_directed:
        edges = directed_edges(edges, network_type, force_bidirectional,
                               from_col=from_col, to_col=to_col)
    if not retain_all:
        edges = largest_component_edges(edges, from_col, to_col,
                                        strongly=True)
    if simplify:
        from pyrosm_spark.operators.graph import simplify_directed_chains

        kw = dict(simplify_kwargs or {})
        if "geometry_col" not in kw and "geometry" in edges.columns:
            kw["geometry_col"] = "geometry"
        edges = simplify_directed_chains(
            edges, u_col=from_col, v_col=to_col, **kw)
        from_col, to_col = "u", "v"  # chain schema is fixed

    endpoint_ids = (
        edges.select(F.col(from_col).alias(node_id_col))
        .union(edges.select(F.col(to_col).alias(node_id_col)))
        .distinct()
    )
    nodes = nodes.join(endpoint_ids, node_id_col, "left_semi")
    return nodes.toPandas(), edges.toPandas(), from_col, to_col


def to_networkx(
    nodes: DataFrame,
    edges: DataFrame,
    network_type: str = "driving",
    force_bidirectional: bool = False,
    retain_all: bool = False,
    osmnx_compatible: bool = True,
    already_directed: bool = False,
    simplify: bool = False,
    simplify_kwargs: dict | None = None,
    from_col: str = "u",
    to_col: str = "v",
    node_id_col: str = "id",
):
    """Export a segment-level network (`get_network(with_nodes=True)`
    output) as a `networkx.MultiDiGraph`.

    The distributed stages run first — directed-edge generation (X1),
    largest-strongly-connected-component retention (X3, unless
    ``retain_all``), optional topological simplification (X2,
    ``simplify=True``: chains of pass-through nodes collapse into
    single edges with summed length, way-id sets and stitched WKB
    geometry), endpoint-node retention (J9) — and only the final
    frames are collected. Mirrors `graphs.py:133-245` `to_networkx`.
    """
    import networkx as nx

    npd, epd, from_col, to_col = prepare_graph_frames(
        nodes, edges, network_type, force_bidirectional, retain_all,
        already_directed, simplify, simplify_kwargs,
        from_col, to_col, node_id_col)

    if osmnx_compatible:
        npd = npd.rename(columns={node_id_col: "osmid", "lon": "x",
                                  "lat": "y"})
        node_key = "osmid"
        if "key" not in epd.columns:
            epd["key"] = 0
    else:
        node_key = node_id_col

    node_ids = npd[node_key].tolist()
    known = set(node_ids)
    node_attrs = list(zip(node_ids, npd.to_dict(orient="records")))

    # key=0 for every edge is the reference's own convention
    # (graph_export.pyx:176 appends [u, v, 0, attrs]); parallel edges
    # between the same (u, v) therefore collapse to the last record,
    # exactly as in the reference's export. Segment-level inputs make
    # true parallels (two ways sharing BOTH adjacent nodes) degenerate.
    edge_records = epd.to_dict(orient="records")
    edge_list = [
        (rec[from_col], rec[to_col], 0, rec)
        for rec in edge_records
        if rec[from_col] in known and rec[to_col] in known
    ]

    graph = nx.MultiDiGraph()
    graph.add_nodes_from(node_attrs)
    graph.add_edges_from(edge_list)
    graph.graph["crs"] = "EPSG:4326"
    graph.graph["name"] = GRAPH_NAME
    nx.set_node_attributes(graph, _street_counts(graph),
                           name="street_count")
    return graph


def igraph_frames(npd, epd, from_col: str = "u", to_col: str = "v",
                  node_id_col: str = "id"):
    """The exact frame contract the reference's ``_create_igraph``
    builds (graph_export.pyx:29-108): igraph vertices must be
    SEQUENTIAL 0..n-1, so nodes gain a ``node_id`` sequence column and
    edges gain ``<from>_seq`` / ``<to>_seq`` mapped through it; edges
    whose endpoint node record is missing are skipped (cropped-data
    tolerance, :78-93). Returns (nodes_pdf, edges_pdf, edge_list) —
    everything ``igraph.Graph(n, directed=True, edges=edge_list,
    vertex_attrs=nodes, edge_attrs=edges)`` needs. Pure pandas; tested
    without the igraph runtime."""
    npd = npd.reset_index(drop=True).copy()
    npd["node_id"] = npd.index
    node_dict = dict(zip(npd[node_id_col].tolist(),
                         npd["node_id"].tolist()))
    keep, fr, to = [], [], []
    u_vals = epd[from_col].tolist()
    v_vals = epd[to_col].tolist()
    for i in range(len(epd)):
        fu = node_dict.get(u_vals[i])
        tv = node_dict.get(v_vals[i])
        if fu is None or tv is None:
            continue  # graph_export.pyx:78-93 — skip, never raise
        keep.append(i)
        fr.append(fu)
        to.append(tv)
    epd = epd.iloc[keep].reset_index(drop=True).copy()
    epd[f"{from_col}_seq"] = fr
    epd[f"{to_col}_seq"] = to
    edge_list = list(zip(fr, to))
    return npd, epd, edge_list


def to_igraph(
    nodes: DataFrame,
    edges: DataFrame,
    network_type: str = "driving",
    force_bidirectional: bool = False,
    retain_all: bool = False,
    already_directed: bool = False,
    simplify: bool = False,
    simplify_kwargs: dict | None = None,
    from_col: str = "u",
    to_col: str = "v",
    node_id_col: str = "id",
    fallback: bool = False,
):
    """Export as ``igraph.Graph`` (graphs.py:240-326). The distributed
    pipeline and the sequential-id frame contract run regardless;
    only the final constructor needs the igraph runtime.

    ``fallback=True`` returns a ``graph_lite.LiteGraph`` — a pure-
    Python stand-in implementing the routing/degree/component API
    subset — instead of raising when python-igraph is absent."""
    npd, epd, from_col, to_col = prepare_graph_frames(
        nodes, edges, network_type, force_bidirectional, retain_all,
        already_directed, simplify, simplify_kwargs,
        from_col, to_col, node_id_col)
    npd, epd, edge_list = igraph_frames(npd, epd, from_col, to_col,
                                        node_id_col)
    try:
        import igraph
    except ImportError as e:  # same message contract as the reference
        if fallback:
            from pyrosm_spark.operators.graph_lite import LiteGraph

            igraph_cls = LiteGraph
        else:
            raise ImportError(
                "'python-igraph' needs to be installed in order to "
                "export the network for igraph.") from e
    else:
        igraph_cls = igraph.Graph
    return igraph_cls(
        n=len(npd), directed=True, edges=edge_list,
        vertex_attrs=npd.to_dict(orient="list"),
        edge_attrs=epd.to_dict(orient="list"),
    )


def pandana_frames(npd, epd, from_col: str = "u", to_col: str = "v",
                   node_id_col: str = "id",
                   weight_cols=("length",)):
    """The frame contract of the reference's ``_build_routing_network``
    (graph_export.pyx:196-206, graphs.py:329-366): nodes renamed
    lon/lat -> x/y and INDEXED by node id (index name dropped), edges
    keyed by (from, to) with the weight columns present; pandana gets
    ``twoway=False`` because the edges are already directed. Edges
    whose endpoints are missing from the node frame are dropped (the
    Network constructor would KeyError on them)."""
    npd = npd.rename(columns={"lat": "y", "lon": "x"}).copy()
    npd = npd.set_index(node_id_col, drop=False)
    npd = npd.rename_axis([None])
    known = set(npd[node_id_col].tolist())
    mask = epd[from_col].isin(known) & epd[to_col].isin(known)
    epd = epd[mask].reset_index(drop=True).copy()
    missing = [w for w in weight_cols if w not in epd.columns]
    if missing:
        raise ValueError(f"weight columns missing from edges: {missing}")
    return npd, epd


def to_pandana(
    nodes: DataFrame,
    edges: DataFrame,
    network_type: str = "driving",
    force_bidirectional: bool = False,
    retain_all: bool = False,
    already_directed: bool = False,
    simplify: bool = False,
    simplify_kwargs: dict | None = None,
    from_col: str = "u",
    to_col: str = "v",
    node_id_col: str = "id",
    weight_cols=("length",),
    fallback: bool = False,
):
    """Export as ``pandana.Network`` (graphs.py:329-366).

    ``fallback=True`` returns a ``graph_lite.LiteNetwork`` — a pure-
    Python stand-in implementing the shortest-path / node-mapping API
    subset — instead of raising when pandana is absent."""
    npd, epd, from_col, to_col = prepare_graph_frames(
        nodes, edges, network_type, force_bidirectional, retain_all,
        already_directed, simplify, simplify_kwargs,
        from_col, to_col, node_id_col)
    npd, epd = pandana_frames(npd, epd, from_col, to_col, node_id_col,
                              weight_cols)
    try:
        from pandana import Network
    except ImportError as e:
        if fallback:
            from pyrosm_spark.operators.graph_lite import LiteNetwork

            Network = LiteNetwork
        else:
            raise ImportError(
                "'pandana' needs to be installed in order to export "
                "the network for it.") from e
    return Network(node_x=npd["x"], node_y=npd["y"],
                   edge_from=epd[from_col], edge_to=epd[to_col],
                   edge_weights=epd[list(weight_cols)], twoway=False)
