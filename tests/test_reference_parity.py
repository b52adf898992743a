"""The reference's OWN pytest assertions, run against THIS engine on the
reference's OWN public fixtures (test.osm.pbf, Helsinki.osm.pbf).

The north rule requires matching pyrosm's join outputs row-for-row on its
own test data. Each test here mirrors one reference test one-for-one —
same fixture, same call, same golden numbers:

* networks   — /root/reference/tests/test_network_parsing.py:32-517
  (walking 238x19, driving 200x19, driving+service 200x19, cycling
  290x21, all 331x22; bbox walking 72x19; nodes=True 1038x21/989x9 and
  291x21/293x9 with bbox — #236 complete-not-cut edges, #199 endpoint
  retention)
* buildings  — /root/reference/tests/test_building_parsing.py:32-203
  (2219 raw ways, 2208x20 default, 584x16 bbox with #236, per-value
  filter counts, Helsinki multipolygon relations 486 rows — #21)
* landuse    — /root/reference/tests/test_landuse_parsing.py:17-35 (51)
* natural    — /root/reference/tests/test_natural_parsing.py:17-35 (14)
* pois       — /root/reference/tests/test_a_poi.py:17-110 (1711
  default rows — #21; multiple filters 59 rows, value uniqueness)

Column parity: way-only frames match the reference's column COUNTS
exactly (19/21/22 networks, 20/16 buildings). Frames that mix relation
or node features differ by exactly one internal column (the reference's
``keep_node_info`` machinery materializes a ``nodes`` refs column
deep in its pipeline; this engine never surfaces ref lists on feature
frames), so those cases assert the reference's REQUIRED column subset
plus exact row counts instead.
"""

import os

import pytest
import pyspark.sql.functions as F

from pyrosm_spark.api import OSM

REF_TEST_PBF = "/root/reference/pyrosm/data/test.osm.pbf"
REF_HELSINKI_PBF = "/root/reference/pyrosm/data/Helsinki.osm.pbf"

needs_fixtures = pytest.mark.skipif(
    not (os.path.exists(REF_TEST_PBF) and os.path.exists(REF_HELSINKI_PBF)),
    reason="reference public fixtures absent",
)

BBOX = [26.94, 60.525, 26.96, 60.535]


@pytest.fixture(scope="module")
def osm_test(spark):
    return OSM(spark, REF_TEST_PBF)


@pytest.fixture(scope="module")
def osm_test_bbox(spark):
    return OSM(spark, REF_TEST_PBF, bounding_box=BBOX)


@pytest.fixture(scope="module")
def osm_helsinki(spark):
    return OSM(spark, REF_HELSINKI_PBF)


def _shape(df):
    return (df.count(), len(df.columns))


# --- networks (test_network_parsing.py) -----------------------------------

NETWORK_CASES = [
    # (network_type, shape, required tag columns, excluded highway values)
    ("walking", (238, 19),
     ["access", "bridge", "foot", "highway", "lanes", "lit", "maxspeed",
      "name", "oneway", "ref", "service", "surface",
      "id", "geometry", "tags", "osm_type", "length"],
     ["motorway"]),
    ("driving", (200, 19),
     ["access", "bridge", "highway", "int_ref", "lanes", "lit", "maxspeed",
      "name", "oneway", "ref", "service", "surface",
      "id", "geometry", "tags", "osm_type", "length"],
     ["footway", "path"]),
    ("driving+service", (200, 19),
     ["access", "bridge", "highway", "id", "geometry", "tags", "osm_type",
      "length"],
     ["footway", "path"]),
    ("cycling", (290, 21),
     ["access", "bicycle", "bridge", "foot", "highway", "lanes", "lit",
      "maxspeed", "name", "oneway", "ref", "service", "surface", "tunnel",
      "id", "geometry", "tags", "osm_type", "length"],
     ["motorway", "motorway_link"]),
    ("all", (331, 22),
     ["access", "bicycle", "bridge", "foot", "highway", "lanes", "lit",
      "maxspeed", "name", "oneway", "ref", "service", "surface", "tunnel",
      "id", "geometry", "tags", "osm_type", "length"],
     []),
]


@needs_fixtures
@pytest.mark.parametrize(
    "ntype,shape,required,excluded",
    NETWORK_CASES, ids=[c[0] for c in NETWORK_CASES])
def test_network_golden_shapes(osm_test, ntype, shape, required, excluded):
    gdf = osm_test.get_network(ntype)
    assert _shape(gdf) == shape
    cols = set(gdf.columns)
    for col in required:
        assert col in cols, col
    if excluded:
        hw = {r["highway"] for r in gdf.select("highway").distinct().collect()}
        for val in excluded:
            assert val not in hw


@needs_fixtures
def test_network_with_bbox(osm_test_bbox):
    """test_network_parsing.py:271-318 — default (walking) network in a
    bbox: complete ways (#236), every edge intersects the box."""
    gdf = osm_test_bbox.get_network()
    assert _shape(gdf) == (72, 19)
    hw = {r["highway"] for r in gdf.select("highway").distinct().collect()}
    assert "motorway" not in hw


@needs_fixtures
def test_nodes_and_edges(osm_test):
    """test_network_parsing.py:447-478 — segment-level frame shapes."""
    nodes, edges = osm_test.get_network("walking", nodes=True)
    assert _shape(edges) == (1038, 21)
    assert _shape(nodes) == (989, 9)
    for col in ("u", "v", "length"):
        assert col in edges.columns
    for col in ("id", "lat", "lon"):
        assert col in nodes.columns


@needs_fixtures
def test_nodes_and_edges_with_bbox(osm_test_bbox):
    """test_network_parsing.py:480-517 — segments intersecting the box
    are kept complete (#236); the node frame retains every endpoint the
    kept edges reference, including just-outside-the-box ones (#199)."""
    nodes, edges = osm_test_bbox.get_network("walking", nodes=True)
    assert _shape(edges) == (291, 21)
    assert _shape(nodes) == (293, 9)
    # consistency for graph export: every u/v resolves in the node frame
    uv = {r["u"] for r in edges.select("u").collect()} | {
        r["v"] for r in edges.select("v").collect()}
    ids = {r["id"] for r in nodes.select("id").collect()}
    assert uv <= ids


# --- buildings (test_building_parsing.py) ---------------------------------

@needs_fixtures
def test_buildings_defaults(osm_test):
    gdf = osm_test.get_buildings()
    assert _shape(gdf) == (2208, 20)
    for col in ["building", "addr:city", "addr:street", "addr:country",
                "addr:postcode", "addr:housenumber", "source",
                "opening_hours", "building:levels", "id", "timestamp",
                "version", "geometry"]:
        assert col in gdf.columns, col


@needs_fixtures
def test_buildings_with_bbox(osm_test_bbox):
    """Straddling buildings returned complete (#236), every feature's
    bbox intersects the box."""
    gdf = osm_test_bbox.get_buildings()
    assert _shape(gdf) == (584, 16)
    for col in ["building", "addr:street", "addr:postcode",
                "addr:housenumber", "opening_hours", "id", "timestamp",
                "version", "geometry", "tags"]:
        assert col in gdf.columns, col


@needs_fixtures
def test_buildings_with_filters(osm_test):
    """Per-building-value filter counts match the value_counts of the
    unfiltered frame (test_building_parsing.py:160-182)."""
    gdf_all = osm_test.get_buildings()
    cnts = {
        r["building"]: r["n"]
        for r in gdf_all.groupBy("building").agg(F.count("*").alias("n"))
        .collect() if r["building"] is not None
    }
    assert cnts  # non-empty
    # the two most common values exercise the path; full loop is O(minutes)
    top = sorted(cnts, key=cnts.get, reverse=True)[:2]
    for val in top:
        filtered = osm_test.get_buildings({"building": [val]})
        assert filtered.count() == cnts[val]
        uniq = {r["building"]
                for r in filtered.select("building").distinct().collect()}
        assert uniq == {val}


@needs_fixtures
def test_buildings_with_relations_helsinki(osm_helsinki):
    """Helsinki multipolygon building relations (#21: unassemblable
    relations are dropped, not force-closed)."""
    gdf = osm_helsinki.get_buildings()
    assert gdf.count() == 486
    for col in ["building", "id", "timestamp", "version", "tags",
                "geometry"]:
        assert col in gdf.columns, col
    # all three element classes survive assembly
    types = {r["osm_type"]
             for r in gdf.select("osm_type").distinct().collect()}
    assert "relation" in types and "way" in types


@needs_fixtures
def test_helsinki_buildings_match_committed_golden(osm_helsinki):
    """The committed golden snapshot (data/goldens/
    helsinki_buildings.parquet — the driver-gate value oracle for
    buildings_relations_helsinki) stays byte-exact against a live run:
    ids, geometry types, WKB lengths and per-feature WKB md5 digests.
    Guards both engine determinism and golden staleness — if assembly
    semantics ever change, this fails before the driver gate does."""
    import pandas as pd
    import pyarrow.parquet as pq

    golden_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "goldens", "helsinki_buildings.parquet")
    golden = pq.read_table(golden_path).to_pandas()

    live = (
        osm_helsinki.get_buildings()
        .select(
            "id", "osm_type", "building",
            F.conv(F.hex(F.substring("geometry", 2, 1)), 16, 10)
            .cast("int").alias("geom_type"),
            F.length("geometry").cast("long").alias("wkb_len"),
            F.md5("geometry").alias("wkb_md5"),
        )
        .toPandas()
    )
    key = ["osm_type", "id"]
    golden = golden.sort_values(key).reset_index(drop=True)
    live = live.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(live[golden.columns.tolist()], golden)


@needs_fixtures
def test_helsinki_geometry_independent_crosscheck(osm_helsinki):
    """Every Helsinki building geometry, cross-checked against an
    INDEPENDENT decode of the same PBF (tests/independent_osm.py: a
    test-local pure-Python PBF reader + WKB parser sharing no code with
    sources/pbf.py or the numpy WKB kernels).

    The committed golden pins the pipeline byte-exact but was generated
    by the pipeline itself, so a systematic assembly bug present at
    golden time would pass it (round-4 ADVICE). This test closes that
    hole at the coordinate level:

    * way buildings: the WKB polygon's exterior ring equals the way's
      node coordinate chain (up to rotation/direction; 1e-9 deg);
    * relation buildings: the multiset of WKB rings equals the rings
      independently stitched from the relation's member ways;
    * ring areas agree (shoelace, rel 1e-9) and the RHR convention
      holds (exterior CCW, holes CW — reference geometry.pyx:17-24).
    """
    from tests import independent_osm as IND

    nodes, ways, rels = IND.read_pbf(REF_HELSINKI_PBF)
    live = (osm_helsinki.get_buildings()
            .select("id", "osm_type", "geometry").collect())
    assert len(live) == 486
    checked_ways = checked_rels = 0
    for r in live:
        (gname, polys) = IND.parse_wkb(bytes(r["geometry"]))
        # RHR: first ring of each polygon CCW, holes CW (degenerate
        # zero-area rings — gappy ways collapsed to <3 distinct points,
        # kept to match the reference's 486-feature count — excepted)
        for rings in polys:
            assert IND.shoelace(rings[0]) >= 0, (r["osm_type"], r["id"])
            for hole in rings[1:]:
                assert IND.shoelace(hole) <= 0, (r["osm_type"], r["id"])
        got_rings = [ring for rings in polys for ring in rings]
        if r["osm_type"] == "way":
            assert gname == "Polygon" and len(got_rings) == 1
            # extract-boundary gaps: refs outside the extract drop out
            # of the chain (J5 semantics — J1 joins the full node table)
            chain = [nodes[n] for n in ways[r["id"]]["refs"]
                     if n in nodes]
            assert (IND.canonical_ring(got_rings[0])
                    == IND.canonical_ring(chain)), r["id"]
            assert IND.shoelace(got_rings[0]) == pytest.approx(
                abs(IND.shoelace(chain)), rel=1e-9)
            checked_ways += 1
        elif r["osm_type"] == "relation":
            members = rels[r["id"]]["members"]
            chains = [[nodes[n] for n in ways[m]["refs"]
                       if n in nodes]
                      for t, m, _ in members
                      if t == "way" and m in ways]
            expected = IND.stitch_rings(chains)
            got = sorted(IND.canonical_ring(g) for g in got_rings)
            exp = sorted(IND.canonical_ring(e) for e in expected)
            assert got == exp, f"relation {r['id']} ring mismatch"
            checked_rels += 1
    assert checked_ways == 423 and checked_rels == 63


@needs_fixtures
def test_network_geometry_independent_crosscheck(osm_test):
    """Every driving-network edge geometry and length on the
    reference's test fixture, cross-checked against the independent
    test-local PBF/WKB readers (see
    test_helsinki_geometry_independent_crosscheck): linestring
    coordinates must equal the way's node chain in way order (1e-9
    deg), and `length` must equal the reference formula recomputed
    from scratch (per-segment haversine at R=6371.0088 km rounded to
    3 decimals, way sum rounded to 0 — distance.py contract)."""
    import math

    from tests import independent_osm as IND

    nodes, ways, _rels = IND.read_pbf(REF_TEST_PBF)

    def hav_m(p1, p2):
        (lon1, lat1), (lon2, lat2) = p1, p2
        la1, la2 = math.radians(lat1), math.radians(lat2)
        d = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2)
             * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
        return 2 * 6371.0088e3 * math.asin(math.sqrt(d))

    live = (osm_test.get_network("driving")
            .select("id", "geometry", "length").collect())
    assert len(live) > 100
    for r in live:
        gname, polys = IND.parse_wkb(bytes(r["geometry"]))
        assert gname == "LineString", r["id"]
        chain = [nodes[n] for n in ways[r["id"]]["refs"] if n in nodes]
        got = [(round(x, 9), round(y, 9)) for x, y in polys[0][0]]
        exp = [(round(x, 9), round(y, 9)) for x, y in chain]
        assert got == exp, f"way {r['id']} coordinate mismatch"
        want = round(sum(round(hav_m(a, b), 3)
                         for a, b in zip(chain, chain[1:])))
        assert abs(r["length"] - want) <= 1.0, (r["id"], r["length"], want)


# --- landuse / natural (test_landuse_parsing.py, test_natural_parsing.py) -

@needs_fixtures
def test_landuse_defaults(osm_test):
    gdf = osm_test.get_landuse()
    assert gdf.count() == 51
    assert "landuse" in gdf.columns


@needs_fixtures
def test_natural_defaults(osm_test):
    gdf = osm_test.get_natural()
    assert gdf.count() == 14
    assert "natural" in gdf.columns


@needs_fixtures
def test_landuse_from_area_having_none(spark):
    """test_landuse_parsing.py:39-56 — a bbox with no data yields an
    empty result (the reference returns None with a warning; this
    engine's DataFrame contract is an empty frame)."""
    bbox = [24.947241, 60.174997, 24.948240, 60.175716]
    osm = OSM(spark, REF_HELSINKI_PBF, bounding_box=bbox)
    assert osm.get_landuse().count() == 0


# --- pois (test_a_poi.py) -------------------------------------------------

@needs_fixtures
def test_pois_defaults_helsinki(osm_helsinki):
    gdf = osm_helsinki.get_pois()
    assert gdf.count() == 1711
    for col in ("id", "geometry"):
        assert col in gdf.columns


@needs_fixtures
def test_pois_multiple_filters(osm_helsinki):
    gdf = osm_helsinki.get_pois({"shop": ["alcohol"], "amenity": ["pub"]})
    assert gdf.count() == 59
    shop = {r["shop"] for r in gdf.select("shop").distinct().collect()}
    amen = {r["amenity"]
            for r in gdf.select("amenity").distinct().collect()}
    assert shop - {None} == {"alcohol"}
    assert amen - {None} == {"pub"}


# --- custom criteria (test_custom_filter.py:63-159) ------------------------

@needs_fixtures
def test_custom_criteria_exclude_residential(osm_test):
    gdf = osm_test.get_data_by_custom_criteria(
        custom_filter={"building": ["residential"]},
        filter_type="exclude",
        osm_keys_to_keep="building",
        tags_as_columns=["building"],
    )
    assert gdf.count() == 1054
    # The reference's allowed-columns contract, plus lat/lon: this
    # engine's union schema is static (a distributed frame's columns
    # cannot depend on whether the node part happened to be empty), so
    # the node-feature coordinate columns are always present.
    allowed = {"geometry", "tags", "building", "id", "osm_type",
               "version", "timestamp", "changeset", "lat", "lon"}
    assert set(gdf.columns) <= allowed
    vals = {r["building"]
            for r in gdf.select("building").distinct().collect()}
    assert "residential" not in vals


@needs_fixtures
def test_custom_criteria_keep_retail(osm_test):
    gdf = osm_test.get_data_by_custom_criteria(
        custom_filter={"building": ["retail"]},
        filter_type="keep",
        osm_keys_to_keep="building",
        tags_as_columns=["building"],
    )
    assert gdf.count() == 2
    vals = {r["building"]
            for r in gdf.select("building").distinct().collect()}
    assert vals == {"retail"}


# --- advanced filters (test_advanced_filter.py:242-310) --------------------

@needs_fixtures
def test_regex_value_union_matches_literal_union(osm_helsinki):
    """issue #116: a regex matching several alternatives equals the
    literal union a plain dict expresses."""
    import re

    regex = osm_helsinki.get_data_by_custom_criteria(
        custom_filter={"highway": [re.compile("footway|cycleway")]})
    literal = osm_helsinki.get_data_by_custom_criteria(
        custom_filter={"highway": ["footway", "cycleway"]})
    ra = {r["id"] for r in regex.select("id").collect()}
    la = {r["id"] for r in literal.select("id").collect()}
    assert ra == la and len(ra) > 0


@needs_fixtures
def test_regex_matches_semicolon_joined_value(osm_helsinki):
    """issue #116: a regex matches a ;-joined multi-value tag via
    substring where the literal exact match misses it."""
    import re

    regex = osm_helsinki.get_data_by_custom_criteria(
        custom_filter={"surface": [re.compile("cobblestone")]})
    literal = osm_helsinki.get_data_by_custom_criteria(
        custom_filter={"surface": ["cobblestone"]})
    rs = {r["surface"]
          for r in regex.select("surface").distinct().collect()} - {None}
    ls = {r["surface"]
          for r in literal.select("surface").distinct().collect()} - {None}
    assert "paved;cobblestone" in rs
    assert "paved;cobblestone" not in ls


@needs_fixtures
def test_network_bracket_union_matches_dict(spark):
    """issue #341: a list of bracket strings (OR) equals the dict form
    with filter_type='keep'."""
    bracket = OSM(spark, REF_HELSINKI_PBF).get_network(
        custom_filter=['["highway"~"^footway$"]', '["highway"~"^cycleway$"]'],
        filter_type="keep")
    plain = OSM(spark, REF_HELSINKI_PBF).get_network(
        custom_filter={"highway": ["footway", "cycleway"]},
        filter_type="keep")
    bi = {r["id"] for r in bracket.select("id").collect()}
    pi = {r["id"] for r in plain.select("id").collect()}
    assert bi == pi and len(bi) > 0
    hw = {r["highway"]
          for r in bracket.select("highway").distinct().collect()}
    assert hw <= {"footway", "cycleway"}


@needs_fixtures
def test_network_and_condition_is_subset(spark):
    """issue #341 AND case: both brackets together select a subset of
    the first bracket alone, and every kept way carries the second
    bracket's key."""
    both = OSM(spark, REF_HELSINKI_PBF).get_network(
        custom_filter='["highway"~"path|footway"]["bicycle"~"."]',
        filter_type="keep")
    first = OSM(spark, REF_HELSINKI_PBF).get_network(
        custom_filter='["highway"~"path|footway"]', filter_type="keep")
    bi = {r["id"] for r in both.select("id").collect()}
    fi = {r["id"] for r in first.select("id").collect()}
    assert bi and bi <= fi
    assert both.filter(F.col("bicycle").isNull()).count() == 0


@needs_fixtures
def test_network_non_highway_key(spark):
    """issue #341: an advanced filter selects by its own positive keys,
    so a railway network is expressible."""
    rail = OSM(spark, REF_HELSINKI_PBF).get_network(
        custom_filter='["railway"~"subway|tram|rail"]', filter_type="keep")
    assert rail.count() > 0
    assert "railway" in rail.columns
    assert rail.filter(F.col("railway").isNull()).count() == 0


# --- complete relations (test_complete_relations.py:28-93) -----------------

STRADDLING_BBOX = [24.94338, 60.17089, 24.95068, 60.17687]


@needs_fixtures
def test_complete_relations_fixes_straddling_buildings(spark):
    """Relations cut by the box reassemble byte-identically to the
    whole-file read when complete_relations=True, and most are broken
    without it (the reference asserts normalized-geometry equality;
    this engine's deterministic assembly makes the WKB byte-exact)."""
    def rel_geoms(osm):
        return {r["id"]: bytes(r["geometry"])
                for r in osm.get_buildings()
                .filter("osm_type = 'relation'")
                .select("id", "geometry").collect()}

    whole = rel_geoms(OSM(spark, REF_HELSINKI_PBF))
    partial = rel_geoms(OSM(spark, REF_HELSINKI_PBF,
                            bounding_box=STRADDLING_BBOX))
    complete = rel_geoms(OSM(spark, REF_HELSINKI_PBF,
                             bounding_box=STRADDLING_BBOX,
                             complete_relations=True))
    common = sorted(set(complete) & set(whole))
    assert len(common) > 0
    for rid in common:
        assert complete[rid] == whole[rid]
    n_fixed = sum(1 for rid in common
                  if not (rid in partial and partial[rid] == whole[rid]))
    assert n_fixed > 0


# --- graph export (test_regressions.py:382-400, #117) ----------------------

@needs_fixtures
def test_networkx_export_sets_street_count(osm_test):
    """#117 — the exported NetworkX graph carries a per-node
    'street_count' attribute (streets incident to each intersection)
    so OSMnx basic_stats works, on the reference's own fixture."""
    nx = pytest.importorskip("networkx")

    nodes, edges = osm_test.get_network("walking", nodes=True)
    graph = osm_test.to_graph(nodes, edges, graph_type="networkx")
    street_count = nx.get_node_attributes(graph, "street_count")
    assert graph.number_of_nodes() > 0
    assert len(street_count) == graph.number_of_nodes()
    assert all(isinstance(c, int) and c >= 1
               for c in street_count.values())


# --- distance (test_distance_calculation.py) -------------------------------

def test_distance_calculations(spark):
    """The reference's haversine golden values, to the same rounding,
    across every unit (distance.py:38-74)."""
    from pyrosm_spark.functions.distance import Unit, haversine

    df = spark.createDataFrame(
        [(0.0, 0.0, 10.0, 10.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double")
    units = [Unit.KILOMETERS, Unit.METERS, Unit.MILES,
             Unit.NAUTICAL_MILES, Unit.FEET, Unit.INCHES]
    row = df.select(*[
        haversine(F.col("lat1"), F.col("lon1"),
                  F.col("lat2"), F.col("lon2"), unit=u).alias(u)
        for u in units]).collect()[0]
    assert round(row[Unit.KILOMETERS], 5) == 1568.52272
    assert round(row[Unit.METERS], 2) == 1568522.72
    assert round(row[Unit.MILES], 6) == 974.634834
    assert round(row[Unit.NAUTICAL_MILES], 5) == 846.93452
    assert round(row[Unit.FEET], 0) == 5146072
    assert round(row[Unit.INCHES], 0) == 61752863


# --- error shapes (test_network_parsing.py:369-405) ------------------------

@needs_fixtures
def test_passing_incorrect_bounding_box(spark):
    with pytest.raises(ValueError, match="bounding_box should be"):
        OSM(spark, REF_TEST_PBF,
            bounding_box="[26.94, 60.525, 26.96, 60.535]")


@needs_fixtures
def test_passing_incorrect_net_type(osm_test):
    with pytest.raises(
            ValueError,
            match="'network_type' should be one of the following"):
        osm_test.get_network("wrong_network")
    with pytest.raises(
            ValueError,
            match="'network_type' should be one of the following"):
        osm_test.get_network(42)


# --- to_pbf crop (test_pbf_export.py:75-114) -------------------------------

CROP_BBOX = [24.9424, 60.1701, 24.9461, 60.1731]


@needs_fixtures
def test_to_pbf_roundtrip_readable(spark, tmp_path):
    """Cropping the Helsinki fixture to a byte-level .osm.pbf and
    re-reading it yields the same network as reading the source with
    the same bounding box (complete-ways crop contract)."""
    osm = OSM(spark, REF_HELSINKI_PBF, bounding_box=CROP_BBOX)
    out = osm.to_pbf(str(tmp_path / "crop.osm.pbf"))
    cropped = OSM(spark, out)
    net = cropped.get_network()
    assert net.count() > 0
    assert cropped.get_buildings().count() > 0
    ref = OSM(spark, REF_HELSINKI_PBF,
              bounding_box=CROP_BBOX).get_network()
    assert net.count() == ref.count()


@needs_fixtures
def test_to_pbf_exact_selection_contract(spark, tmp_path):
    """The cropped file holds exactly the complete-ways selection: ways
    with >=1 in-box node, plus in-box nodes and every ref of a kept way
    that exists in the source (test_pbf_export.py:96-114)."""
    from pyrosm_spark.sources import pbf as pbfmod

    def read_elements(path):
        with open(path, "rb") as f:
            data = f.read()
        node_ids, way_refs = set(), {}
        for typ, off, ln in pbfmod.iter_blob_index(path):
            if typ != "OSMData":
                continue
            dec = pbfmod.decode_primitive_block(
                pbfmod.decompress_blob(data[off:off + ln]))
            if "nodes" in dec:
                node_ids.update(int(i) for i in dec["nodes"]["id"])
                for i, lon, lat in zip(dec["nodes"]["id"],
                                       dec["nodes"]["lon"],
                                       dec["nodes"]["lat"]):
                    coords[int(i)] = (lon, lat)
            if "ways" in dec:
                for _, row in dec["ways"].iterrows():
                    way_refs[int(row["id"])] = [int(r)
                                                for r in row["refs"]]
        return node_ids, way_refs

    coords = {}
    src_nodes, src_ways = read_elements(REF_HELSINKI_PBF)
    xmin, ymin, xmax, ymax = CROP_BBOX
    nodes_in = {i for i, (lon, lat) in coords.items()
                if xmin <= lon <= xmax and ymin <= lat <= ymax}
    expected_ways = {w for w, refs in src_ways.items()
                     if any(r in nodes_in for r in refs)}
    expected_nodes = set(nodes_in)
    for w in expected_ways:
        expected_nodes.update(src_ways[w])
    expected_nodes &= src_nodes

    osm = OSM(spark, REF_HELSINKI_PBF, bounding_box=CROP_BBOX)
    out = osm.to_pbf(str(tmp_path / "crop.osm.pbf"))
    coords = {}
    out_nodes, out_ways = read_elements(out)
    assert set(out_ways) == expected_ways
    assert out_nodes == expected_nodes
    assert nodes_in <= out_nodes


# --- #144 geometry typing (test_geometry.py:41-110) ------------------------

def _wkb_type(b):
    import struct

    return struct.unpack("<I", bytes(b)[1:5])[0]


WKB_LINESTRING, WKB_POLYGON = 2, 3


@needs_fixtures
def test_custom_filter_highway_does_not_linestringify_polygons(osm_test):
    """#144 — the polygon-vs-line decision is per-way (its own tags),
    so adding 'highway' to a filter must not flip building polygons."""
    buildings = osm_test.get_data_by_custom_criteria(
        custom_filter={"building": True}, filter_type="keep")
    rows = buildings.select("geometry").collect()
    assert len(rows) == 2208
    assert {_wkb_type(r["geometry"]) for r in rows} == {WKB_POLYGON}

    combined = osm_test.get_data_by_custom_criteria(
        custom_filter={"building": True, "highway": True},
        filter_type="keep")
    brows = combined.filter(F.col("building").isNotNull()) \
        .select("geometry").collect()
    assert len(brows) == 2208
    assert {_wkb_type(r["geometry"]) for r in brows} == {WKB_POLYGON}


@needs_fixtures
def test_closed_highway_without_area_is_linestring(osm_helsinki):
    """#144 — a closed highway way without area=yes (service roundabout
    8035241) stays a line in feature extraction."""
    gdf = osm_helsinki.get_data_by_custom_criteria(
        custom_filter={"highway": True}, filter_type="keep")
    rows = gdf.filter("osm_type = 'way' AND id = 8035241") \
        .select("geometry").collect()
    assert len(rows) == 1
    assert _wkb_type(rows[0]["geometry"]) == WKB_LINESTRING


@needs_fixtures
def test_closed_highway_area_yes_is_polygon(osm_helsinki):
    """#144 — closed highway ways tagged area=yes (plazas 4369051,
    18379563) are typed Polygon; all area=yes ways are polygons."""
    gdf = osm_helsinki.get_data_by_custom_criteria(
        custom_filter={"highway": True}, filter_type="keep")
    ways = gdf.filter("osm_type = 'way'")
    for plaza_id in (4369051, 18379563):
        rows = ways.filter(f"id = {plaza_id}") \
            .select("geometry", "area").collect()
        assert len(rows) == 1
        assert rows[0]["area"] == "yes"
        assert _wkb_type(rows[0]["geometry"]) == WKB_POLYGON
    area_rows = ways.filter("area = 'yes'").select("geometry").collect()
    assert len(area_rows) > 0
    assert {_wkb_type(r["geometry"]) for r in area_rows} == {WKB_POLYGON}


@needs_fixtures
def test_network_extraction_keeps_areas_as_lines(osm_helsinki):
    """#144 guard — the network path NEVER yields polygons, even for
    area=yes plazas (a polygon is not routable)."""
    edges = osm_helsinki.get_network("all")
    types = {_wkb_type(r["geometry"])
             for r in edges.select("geometry").collect()}
    assert WKB_POLYGON not in types


# --- keep_node_info (pyrosm.py:185,490,583) --------------------------------

@needs_fixtures
def test_keep_node_info_exposes_way_refs(spark):
    """The reference's opt-in: osm.keep_node_info = True keeps the way
    frames' ref list as a 'nodes' column; the default drops it."""
    osm = OSM(spark, REF_TEST_PBF)
    assert "nodes" not in osm.get_buildings().columns
    osm.keep_node_info = True
    gdf = osm.get_buildings()
    assert "nodes" in gdf.columns
    assert gdf.count() == 2208
    row = gdf.filter("nodes is not null") \
        .select("nodes").limit(1).collect()[0]
    assert len(row["nodes"]) >= 2
    net = osm.get_network("walking")
    assert "nodes" in net.columns and net.count() == 238
