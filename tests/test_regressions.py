"""Direct ports of the reference's regression semantics onto the synth
world (VERDICT r1 item 10):

- #144 per-way (not per-batch) polygon decision under combined filters
  (reference tests/test_geometry.py:41-60)
- #108/#112 exclude-filter OR-semantics across secondary keys
  (reference tests/test_regressions.py:130-207)
- keep-filter any-key OR-semantics
- complete_relations WKB-exact completion of bbox-cut relations
  (reference tests/test_complete_relations.py:26-60)
"""

import pytest
from pyspark.sql import functions as F

from pyrosm_spark.functions import geometry_np as G
from pyrosm_spark.functions.filters import element_filter_column
from pyrosm_spark.operators.layers import get_layer
from pyrosm_spark.operators.network import get_network
from pyrosm_spark.operators.osm_source import load_osm
from pyrosm_spark.synth.osm import TEST_BBOX


@pytest.fixture(scope="module")
def osm(spark, synth_dir):
    return load_osm(spark, synth_dir)


_EXCLUDED_SERVICE = {"parking", "parking_aisle", "private",
                     "emergency_access"}
_EXCLUDED_HIGHWAY = {
    "cycleway", "footway", "path", "pedestrian", "steps", "track",
    "corridor", "elevator", "escalator", "proposed", "construction",
    "bridleway", "abandoned", "platform", "raceway",
}


def _geom_types(df):
    rows = df.select("id", "geometry").collect()
    return {r["id"]: G.parse_wkb(bytes(r["geometry"]))[0] for r in rows
            if r["geometry"] is not None}


def test_144_combined_filter_keeps_per_way_polygon_decision(spark, osm):
    """#144 — adding 'highway' to a building keep-filter must not flip
    closed-way building polygons into linestrings: the polygon-vs-line
    decision is per WAY (its own tags), never per batch/filter."""
    nodes, ways, rels = osm
    only_b = get_layer(nodes, ways, rels, {"building": True},
                       include_nodes=False)
    combined = get_layer(nodes, ways, rels,
                         {"building": True, "highway": True},
                         include_nodes=False)
    tb = _geom_types(only_b.filter("osm_type = 'way'"))
    tc = _geom_types(combined.filter("osm_type = 'way'"))
    # every building way keeps exactly its type under the wider filter
    for wid, gtype in tb.items():
        assert tc[wid] == gtype, wid
    # and the combined result has at least one linestring highway AND
    # one polygon building (both decisions coexist in one batch)
    assert G.WKB_LINESTRING in set(tc.values())
    assert G.WKB_POLYGON in set(tc.values())


def test_112_exclude_filter_does_not_leak_secondary_keys(spark, osm):
    """#112 — an exclude filter listing `service` values must drop
    those ways even when their `highway` value alone would survive
    (the reference's early-break bug)."""
    nodes, ways, rels = osm
    drive_filter = {
        "area": ["yes"],
        "service": sorted(_EXCLUDED_SERVICE),
        "highway": sorted(_EXCLUDED_HIGHWAY),
        "motor_vehicle": ["no"],
        "motorcar": ["no"],
    }
    out = get_layer(nodes, ways, rels, drive_filter,
                    filter_type="exclude", include_nodes=False,
                    include_relations=False)
    present = {
        r[0] for r in out.select(F.col("tags")["service"]).collect()
        if r[0] is not None
    }
    assert not (present & _EXCLUDED_SERVICE), present


def test_108_driving_network_excludes_service_roads(spark, osm):
    """#108 — get_network('driving') leaks neither excluded highway
    classes nor excluded service values via secondary keys."""
    nodes, ways, _ = osm
    edges = get_network(nodes, ways, "driving")
    hw = {r[0] for r in
          edges.select(F.col("tags")["highway"]).distinct().collect()
          if r[0] is not None}
    assert not (hw & _EXCLUDED_HIGHWAY), hw & _EXCLUDED_HIGHWAY
    sv = {r[0] for r in
          edges.select(F.col("tags")["service"]).distinct().collect()
          if r[0] is not None}
    assert not (sv & _EXCLUDED_SERVICE), sv & _EXCLUDED_SERVICE


def test_keep_filter_matches_any_key_or_semantics(spark):
    """#108/#112 follow-on — a keep filter with multiple keys matches
    when ANY key matches (OR): highway=service + service=driveway must
    pass keep={'highway': ['path'], 'service': ['driveway']}."""
    df = spark.createDataFrame(
        [(1, {"highway": "service", "service": "driveway"}),
         (2, {"highway": "path"}),
         (3, {"highway": "service", "service": "alley"}),
         (4, {"service": "driveway"})],
        "id long, tags map<string,string>")
    pred = element_filter_column(
        F.col("tags"), {"highway": ["path"], "service": ["driveway"]},
        filter_type="keep")
    kept = {r["id"] for r in df.filter(pred).collect()}
    assert kept == {1, 2, 4}


def test_complete_relations_restores_exact_wkb(spark, osm):
    """Reference test_complete_relations semantics, strengthened to
    byte-equality: with complete_relations=True, a bbox-cut relation's
    geometry equals the whole-world geometry EXACTLY (same WKB bytes),
    for every relation common to both reads."""
    nodes, ways, rels = osm
    whole = get_layer(nodes, ways, rels, {"building": True, "route": True,
                                          "landuse": True},
                      include_nodes=False)
    whole_rel = {r["id"]: bytes(r["geometry"]) for r in
                 whole.filter("osm_type = 'relation'")
                 .select("id", "geometry").collect()}
    complete = get_layer(nodes, ways, rels,
                         {"building": True, "route": True,
                          "landuse": True},
                         include_nodes=False, bbox=TEST_BBOX,
                         complete_relations=True)
    complete_rel = {r["id"]: bytes(r["geometry"]) for r in
                    complete.filter("osm_type = 'relation'")
                    .select("id", "geometry").collect()}
    common = set(whole_rel) & set(complete_rel)
    assert common, "no common relations between whole and completed read"
    for rid in common:
        assert complete_rel[rid] == whole_rel[rid], rid
    partial = get_layer(nodes, ways, rels,
                        {"building": True, "route": True,
                         "landuse": True},
                        include_nodes=False, bbox=TEST_BBOX,
                        complete_relations=False)
    partial_rel = {r["id"]: bytes(r["geometry"]) for r in
                   partial.filter("osm_type = 'relation'")
                   .select("id", "geometry").collect()}
    # at least one relation is cut or dropped without completion
    assert any(rid not in partial_rel or partial_rel[rid] != whole_rel[rid]
               for rid in common)


def test_bbox_drops_relations_without_inbox_member_ways(spark):
    """collect.py:606-614: with a bounding box, a relation survives only
    with >=1 member way holding an in-box node — REGARDLESS of
    complete_relations, which lifts only the member-level
    partial-geometry restriction. An out-of-box relation's tags must
    not leak presentation columns into the result either."""
    from pyspark.sql import types as T

    nodes = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 1.0), (3, 2.0, 2.0), (4, 1.0, 2.0),
         (5, 20.0, 20.0), (6, 21.0, 20.0), (7, 21.0, 21.0),
         (8, 20.0, 21.0)],
        "id long, lon double, lat double",
    ).withColumn("tags", F.create_map().cast("map<string,string>"))
    ways = spark.createDataFrame(
        [(10, [1, 2, 3, 4, 1]), (20, [5, 6, 7, 8, 5])],
        "id long, refs array<long>",
    ).withColumn("tags", F.create_map().cast("map<string,string>"))
    mem_t = T.ArrayType(T.StructType([
        T.StructField("member_type", T.StringType()),
        T.StructField("member_id", T.LongType()),
        T.StructField("member_role", T.StringType()),
    ]))
    rels = spark.createDataFrame(
        [(100, [("way", 10, "outer")],
          {"type": "multipolygon", "building": "yes", "name": "In"}),
         (200, [("way", 20, "outer")],
          {"type": "multipolygon", "building": "yes", "name": "Out",
           "historic": "fort"})],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("members", mem_t),
            T.StructField("tags", T.MapType(T.StringType(),
                                            T.StringType())),
        ]),
    )
    bbox = (0.0, 0.0, 10.0, 10.0)
    for complete in (True, False):
        got = get_layer(nodes, ways, rels, {"building": True},
                        include_nodes=False, bbox=bbox,
                        complete_relations=complete,
                        tag_cols=("name", "historic"))
        assert {r["id"] for r in got.select("id").collect()} == {100}, \
            f"complete_relations={complete}"
        assert "historic" not in got.columns and "name" in got.columns
    whole = get_layer(nodes, ways, rels, {"building": True},
                      include_nodes=False,
                      tag_cols=("name", "historic"))
    assert {r["id"] for r in whole.select("id").collect()} == {100, 200}
    assert "historic" in whole.columns


def test_mixed_true_list_means_any_value_uniformly(spark):
    """A mixed value list ['yes', True] means "any value for this key"
    for EVERY element kind. (The reference's two paths disagree —
    data_filter.pyx:171 vs :279-285 — this engine standardizes on the
    ways-path/Solver semantics; see dict_match_column.)"""
    from pyrosm_spark.functions.filters import element_filter_column

    df = spark.createDataFrame(
        [(1, {"building": "yes"}), (2, {"building": "retail"}),
         (3, {"highway": "path"})],
        "id long, tags map<string,string>")
    keep = element_filter_column(
        F.col("tags"), {"building": ["yes", True]}, filter_type="keep")
    assert {r["id"] for r in df.filter(keep).collect()} == {1, 2}
    # exclude with default osm_keys (the filter's own keys): the
    # candidate gate drops non-building rows too (data_manager.pyx:16-24
    # derives osm_keys from the filter; the gate applies in BOTH
    # directions, data_filter.pyx:147-148) and every building row
    # matches any-value -> nothing survives
    excl = element_filter_column(
        F.col("tags"), {"building": ["yes", True]}, filter_type="exclude")
    assert {r["id"] for r in df.filter(excl).collect()} == set()
    # explicit osm_keys decouple the gate: highway-carrying rows that
    # don't match the building exclusion survive
    excl_hw = element_filter_column(
        F.col("tags"), {"building": ["yes", True]}, osm_keys=["highway"],
        filter_type="exclude")
    assert {r["id"] for r in df.filter(excl_hw).collect()} == {3}
