"""Spark engine vs pure-Python oracle: network + layer parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrosm_spark.functions import geometry_np as G
from pyrosm_spark.operators.layers import (
    get_boundaries,
    get_buildings,
    get_layer,
    get_pois,
)
from pyrosm_spark.operators.network import (
    directed_edges,
    get_network,
)
from pyrosm_spark.operators.osm_source import load_osm
from pyrosm_spark.operators.presets import network_filter
from pyrosm_spark.synth.osm import TEST_BBOX

from tests import oracle


@pytest.fixture(scope="module")
def osm(spark, synth_dir):
    return load_osm(spark, synth_dir)


def test_network_driving_matches_oracle(spark, synth_dir, osm):
    nodes, ways, rels = osm
    edges = get_network(nodes, ways, "driving")
    got = {
        r["id"]: r["length"]
        for r in edges.select("id", "length").collect()
    }
    exp = oracle.network_oracle(synth_dir, network_filter("driving"))
    assert set(got) == set(exp)
    for wid, (_, length) in exp.items():
        assert got[wid] == pytest.approx(length, abs=1.0), wid
    assert len(got) > 50


@pytest.mark.parametrize("ntype", ["walking", "cycling", "all"])
def test_network_types_match_oracle(spark, synth_dir, osm, ntype):
    nodes, ways, _ = osm
    edges = get_network(nodes, ways, ntype)
    got = {r["id"] for r in edges.select("id").collect()}
    nf = network_filter(ntype)
    exp = set(oracle.network_oracle(
        synth_dir, nf, filter_type="keep" if nf is None else "exclude"))
    assert got == exp
    assert len(got) > 0


def test_network_custom_bracket_filter(spark, osm, synth_dir):
    nodes, ways, _ = osm
    edges = get_network(
        nodes, ways,
        custom_filter='["highway"~"path|cycleway"]["bicycle"!="no"]',
    )
    got = {r["id"] for r in edges.select("id").collect()}
    # independent oracle over raw rows
    rows = oracle.load_rows(f"{synth_dir}/osm_ways.parquet")
    nodes_rows = oracle.load_rows(f"{synth_dir}/osm_nodes.parquet")
    xy = {n["id"]: (n["lon"], n["lat"]) for n in nodes_rows if n["visible"]}
    import re as _re
    exp = set()
    for w in rows:
        if not w["visible"]:
            continue
        t = oracle.tagdict(w)
        if "highway" not in t or not _re.search("path|cycleway", t["highway"]):
            continue
        if t.get("bicycle") == "no":
            continue
        if len(oracle.resolve_coords(w["refs"], xy)) >= 2:
            exp.add(w["id"])
    assert got == exp and len(exp) > 0


def test_gappy_way_preserves_subsequence(spark, osm, synth_dir):
    """Way with missing node refs keeps the resolvable subsequence in
    order (J1 semantics, geometry.pyx:295-342)."""
    nodes, ways, _ = osm
    gappy = ways.filter(F.col("tags")["name"] == "Gappy Road")
    edges = get_network(nodes, gappy, "all")
    row = edges.select("geometry").collect()
    assert len(row) == 1
    t, coords = G.parse_wkb(row[0]["geometry"])
    assert t == G.WKB_LINESTRING and len(coords) == 3  # 5 refs, 2 missing


def test_network_nodes_and_edges_segments(spark, osm, synth_dir):
    nodes, ways, _ = osm
    nodes_df, edges = get_network(nodes, ways, "driving", with_nodes=True)
    seg = edges.select("id", "u", "v", "length").collect()
    exp = oracle.network_oracle(synth_dir, network_filter("driving"))
    # per-way sum of segment lengths == way length (round-0 at way level)
    by_way = {}
    for r in seg:
        by_way.setdefault(r["id"], []).append(r)
    assert set(by_way) == set(exp)
    for wid, (n_pts, length) in exp.items():
        s = by_way[wid]
        assert len(s) == n_pts - 1
        assert round(sum(x["length"] for x in s)) == pytest.approx(length, abs=1.0)
        for x in s:
            assert x["u"] != x["v"] or n_pts <= 2
    # J9: every u/v id present in the node frame
    node_ids = {r["id"] for r in nodes_df.select("id").collect()}
    uv = {r["u"] for r in seg} | {r["v"] for r in seg}
    assert uv <= node_ids


def test_directed_edges_oneway_semantics(spark, osm):
    nodes, ways, _ = osm
    _, edges = get_network(nodes, ways, "driving", with_nodes=True)
    d = directed_edges(edges, "driving")
    base = edges.select("id", "u", "v", F.col("tags")["oneway"].alias("ow"),
                        F.col("tags")["junction"].alias("j")).collect()
    got = {(r["id"], r["u"], r["v"]) for r in d.select("id", "u", "v").collect()}
    exp = set()
    for r in base:
        ow = r["ow"]
        oneway = (ow in ("yes", "true", "1", "-1", "T", "F")) or r["j"] == "roundabout"
        if not oneway:
            exp.add((r["id"], r["u"], r["v"]))
            exp.add((r["id"], r["v"], r["u"]))
        elif ow in ("-1", "T"):
            exp.add((r["id"], r["v"], r["u"]))
        else:
            exp.add((r["id"], r["u"], r["v"]))
    assert got == exp


def test_directed_edges_network_type_case_insensitive(spark, osm):
    """'Cycling' must keep the oneway:bicycle contraflow override —
    the suffix lookup is case-insensitive like the upstream
    network_type validation."""
    nodes, ways, _ = osm
    _, edges = get_network(nodes, ways, "cycling", with_nodes=True)
    lower = directed_edges(edges, "cycling").select("id", "u", "v")
    mixed = directed_edges(edges, "Cycling").select("id", "u", "v")
    assert {tuple(r) for r in lower.collect()} \
        == {tuple(r) for r in mixed.collect()}


def test_buildings_layer(spark, osm, synth_dir):
    nodes, ways, rels = osm
    b = get_buildings(nodes, ways, rels)
    rows = b.select("id", "osm_type", "geometry", "building").collect()
    assert all(r["geometry"] is not None for r in rows)
    way_rows = [r for r in rows if r["osm_type"] == "way"]
    rel_rows = [r for r in rows if r["osm_type"] == "relation"]
    assert len(way_rows) > 100
    # closed building ways are polygons with CCW shells (G4 + G8)
    polys = 0
    for r in way_rows:
        t, payload = G.parse_wkb(r["geometry"])
        if t == G.WKB_POLYGON:
            polys += 1
            assert G.signed_area(payload[0]) > 0
    assert polys > 100
    # relation multipolygons present: Holey(1), SplitRing(3), Open->dropped,
    # DupMembers(9); Collide is leisure=park (not building)
    names = {
        r["id"] for r in rel_rows
    }
    assert len(rel_rows) >= 3
    # building=yes + area=no closed way must be a LineString (area override)
    ls = [r for r in way_rows
          if G.parse_wkb(r["geometry"])[0] == G.WKB_LINESTRING]
    assert len(ls) >= 1


def test_relation_hole_semantics(spark, osm):
    """Holey: outer+inner -> polygon with 1 hole; IslandInHole -> 2 shells."""
    nodes, ways, rels = osm
    layer = get_layer(nodes, ways, rels, {"name": True}, include_nodes=False,
                      tag_cols=("name",))
    rows = {r["name"]: r for r in layer.filter(
        F.col("osm_type") == "relation").select(
        "name", "geometry").collect() if r["name"]}
    t, polys = G.parse_wkb(rows["Holey"]["geometry"])
    assert t == G.WKB_MULTIPOLYGON and len(polys) == 1 and len(polys[0]) == 2
    t, polys = G.parse_wkb(rows["IslandInHole"]["geometry"])
    assert len(polys) == 2
    ring_counts = sorted(len(p) for p in polys)
    assert ring_counts == [1, 2]
    t, polys = G.parse_wkb(rows["SplitRing"]["geometry"])
    assert len(polys) == 1 and len(polys[0]) == 2  # stitched outer + hole
    assert "Open" not in rows  # unclosed ring -> dropped relation


def test_relation_members_excluded_from_ways(spark, osm):
    """J4: member ways of kept relations leave the standalone output."""
    nodes, ways, rels = osm
    b = get_buildings(nodes, ways, rels)
    way_ids = {r["id"] for r in b.filter(F.col("osm_type") == "way")
               .select("id").collect()}
    from pyrosm_spark.operators.relations import relation_member_ways
    member_ids = {r["way_id"] for r in relation_member_ways(rels).collect()}
    assert not (way_ids & member_ids)


def test_route_relation_is_multilinestring(spark, osm):
    nodes, ways, rels = osm
    layer = get_layer(nodes, ways, rels, {"route": True}, include_nodes=False)
    rows = layer.filter(F.col("osm_type") == "relation").select(
        "geometry").collect()
    assert len(rows) == 1
    t, _ = G.parse_wkb(rows[0]["geometry"])
    assert t == G.WKB_MULTILINESTRING


def test_boundaries_name_filter(spark, osm):
    nodes, ways, rels = osm
    b = get_boundaries(nodes, ways, rels, name="Testilä")
    rows = b.collect()
    assert len(rows) == 1
    t, polys = G.parse_wkb(rows[0]["geometry"])
    assert t == G.WKB_MULTIPOLYGON


def test_pois(spark, osm, synth_dir):
    nodes, ways, rels = osm
    p = get_pois(nodes, ways, rels, {"amenity": True, "shop": ["supermarket"]})
    rows = p.select("id", "osm_type", "amenity", "shop").collect()
    node_rows = [r for r in rows if r["osm_type"] == "node"]
    assert all(r["amenity"] or r["shop"] == "supermarket" for r in node_rows)
    # oracle count over raw rows
    raw = oracle.load_rows(f"{synth_dir}/osm_nodes.parquet")
    exp = [
        n for n in raw
        if n["visible"] and (
            "amenity" in oracle.tagdict(n)
            or oracle.tagdict(n).get("shop") == "supermarket")
    ]
    assert len(node_rows) == len(exp)


def test_bbox_complete_ways(spark, osm, synth_dir):
    """J2: a way with >=1 in-box ref is kept whole; all-out ways drop."""
    nodes, ways, _ = osm
    edges = get_network(nodes, ways, "all", bbox=TEST_BBOX)
    got = {r["id"] for r in edges.select("id").collect()}
    # oracle
    nrows = oracle.load_rows(f"{synth_dir}/osm_nodes.parquet")
    wrows = oracle.load_rows(f"{synth_dir}/osm_ways.parquet")
    xy = {n["id"]: (n["lon"], n["lat"]) for n in nrows if n["visible"]}
    x0, y0, x1, y1 = TEST_BBOX
    inbox = {
        n["id"] for n in nrows
        if n["visible"] and x0 <= n["lon"] <= x1 and y0 <= n["lat"] <= y1
    }
    exp = set()
    for w in wrows:
        if not w["visible"] or "highway" not in oracle.tagdict(w):
            continue
        if not any(r in inbox for r in w["refs"]):
            continue
        if len(oracle.resolve_coords(w["refs"], xy)) >= 2:
            exp.add(w["id"])
    assert got == exp
    # straddler ways included with full (out-of-box) geometry
    named = get_network(nodes, ways, "all", bbox=TEST_BBOX).filter(
        F.col("tags")["name"].startswith("Straddler"))
    rows = named.select("geometry").collect()
    assert len(rows) == 3
    for r in rows:
        _, coords = G.parse_wkb(r["geometry"])
        assert coords[:, 0].min() < x0  # geometry extends outside the box


def test_building_candidate_list_reference_parity():
    """BUILDING_TAG_COLS now carries the reference's full
    config/default_tags.py building list — the golden columns its
    tests/test_building_parsing.py:70-83 requires must all be
    candidates (they materialize whenever the data carries them)."""
    from pyrosm_spark.operators.presets import (
        BUILDING_TAG_COLS,
        POI_TAG_COLS,
    )

    golden = ["building", "addr:city", "addr:street", "addr:country",
              "addr:postcode", "addr:housenumber", "source",
              "opening_hours", "building:levels"]
    for c in golden:
        assert c in BUILDING_TAG_COLS, c
    # POIs = union of amenity/shop/tourism lists (pyrosm.py:974-985)
    for c in ["amenity", "shop", "tourism", "opening_hours", "operator",
              "internet_access"]:
        assert c in POI_TAG_COLS, c


def test_layer_materializes_only_occurring_candidates(spark, osm):
    """Occurring-keys presentation: every candidate key present in the
    data becomes a column under its RAW OSM name; never-occurring
    candidates (the bulk of the 37-key list on the synth world) do
    not widen the frame."""
    from pyspark.sql import functions as F

    from pyrosm_spark.operators.layers import get_buildings
    from pyrosm_spark.operators.presets import BUILDING_TAG_COLS

    nodes, ways, rels = osm
    b = get_buildings(nodes, ways, rels)
    base = {"id", "tags", "geometry", "osm_type", "lon", "lat",
            "members", "version", "changeset", "timestamp"}
    tag_cols = [c for c in b.columns if c not in base]
    for c in tag_cols:
        assert c in BUILDING_TAG_COLS, c
        # every materialized column has at least one value
        assert b.filter(F.col(c).isNotNull()).limit(1).count() == 1, c
    assert "building" in tag_cols


def test_boundaries_types_name_search_and_validation(spark, osm):
    """Reference test_boundary_parsing semantics over the synth world:
    default administrative, boundary_type='all' superset,
    national_park selection, substring name search, and invalid-type
    rejection through the facade."""
    from pyrosm_spark.api import OSM

    nodes, ways, rels = osm
    admin = get_boundaries(nodes, ways, rels)
    names_admin = {r[0] for r in
                   admin.select(F.col("tags")["name"]).collect()}
    assert "Testilä" in names_admin

    allb = get_boundaries(nodes, ways, rels, boundary_type="all")
    park = get_boundaries(nodes, ways, rels,
                          boundary_type="national_park")
    # the synth national_park relation's only member is ONE part of a
    # split ring — the ring cannot close, so the relation drops (the
    # reference's open-ring drop semantics); the type filter itself is
    # exercised end-to-end
    assert park.count() == 0
    assert allb.count() >= admin.count()

    # substring name search (F10)
    found = get_boundaries(nodes, ways, rels, name="Testi")
    assert {r[0] for r in found.select(F.col("tags")["name"]).collect()} \
        == {"Testilä"}
    none = get_boundaries(nodes, ways, rels, name="Nowhere")
    assert none.count() == 0
    # regex name search: boundary.py:79 is pandas str.contains with
    # regex=True, so alternation must match
    alt = get_boundaries(nodes, ways, rels, name="Nowhere|Testilä")
    assert {r[0] for r in alt.select(F.col("tags")["name"]).collect()} \
        == {"Testilä"}

    # facade validation: unknown boundary_type rejected, case
    # normalization accepted
    api = OSM(spark, "/root/repo/data/synth")
    with pytest.raises(ValueError):
        api.get_boundaries(boundary_type="Incorrect_type")
    assert api.get_boundaries(boundary_type=" Administrative ").count() \
        == admin.count()


@pytest.mark.parametrize("seed,grid", [(7, 12), (1234, 20)])
def test_network_matches_oracle_on_fresh_worlds(spark, tmp_path, seed,
                                                grid):
    """The seed-42 world the rest of the suite shares can mask
    seed-specific coincidences; regenerate DIFFERENT worlds and re-run
    the driving-network differential (ids + reference-rounded lengths)
    against the independent oracle on each."""
    from pyrosm_spark.synth import ensure_osm_tables

    d = str(tmp_path / f"world_{seed}")
    ensure_osm_tables(d, grid=grid, seed=seed)
    nodes, ways, _ = load_osm(spark, d)
    edges = get_network(nodes, ways, "driving")
    got = {r["id"]: r["length"]
           for r in edges.select("id", "length").collect()}
    exp = oracle.network_oracle(d, network_filter("driving"))
    assert set(got) == set(exp)
    for wid, (_, length) in exp.items():
        assert got[wid] == pytest.approx(length, abs=1.0), wid
    assert len(got) > 10


def test_driving_psv_spelling_accepted():
    """'driving_psv' is in the reference's accepted list (the Conf
    attribute name); there it silently falls through to the unfiltered
    network — here it means the psv-inclusive driving filter, same as
    'driving+psv'/'driving+service'."""
    from pyrosm_spark.operators.presets import network_filter

    f = network_filter("driving_psv")
    assert f == network_filter("driving+psv")
    assert "psv" not in f  # psv-INCLUSIVE: no psv exclude entry
    assert "psv" in network_filter("driving")
