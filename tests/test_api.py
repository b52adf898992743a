"""OSM facade: the pyrosm-shaped user API over the operators.

Differential strategy: every facade method must equal the functional
operator it fronts (same plan, same rows) — the facade adds surface,
never semantics.
"""

import pytest
from pyspark.sql import functions as F

from pyrosm_spark import OSM
from pyrosm_spark.operators import layers as L
from pyrosm_spark.operators.network import get_network
from pyrosm_spark.operators.osm_source import load_osm


@pytest.fixture(scope="module")
def osm(spark, synth_dir):
    return OSM(spark, synth_dir)


@pytest.fixture(scope="module")
def tables(spark, synth_dir):
    return load_osm(spark, synth_dir)


def ids(df):
    return sorted((r["osm_type"], r["id"]) for r in
                  df.select("osm_type", "id").collect())


def test_bbox_validation(spark, synth_dir):
    with pytest.raises(ValueError, match="4 coordinates"):
        OSM(spark, synth_dir, bounding_box=[1, 2, 3])
    with pytest.raises(ValueError, match="swapped/inverted"):
        OSM(spark, synth_dir, bounding_box=[2, 0, 1, 1])
    with pytest.raises(ValueError, match="boolean"):
        OSM(spark, synth_dir, keep_metadata="yes")


def test_get_network_matches_operator(osm, tables):
    n, w, _ = tables
    got = osm.get_network("driving")
    ref = get_network(n, w, "driving")
    assert sorted(r["id"] for r in got.select("id").collect()) == \
        sorted(r["id"] for r in ref.select("id").collect())


def test_get_network_nodes_tuple(osm):
    nodes, edges = osm.get_network("driving", nodes=True)
    assert {"u", "v", "length"} <= set(edges.columns)
    assert nodes.count() > 0


def test_layers_match_operators(osm, tables):
    n, w, r = tables
    assert ids(osm.get_buildings()) == ids(L.get_buildings(n, w, r))
    assert ids(osm.get_pois()) == ids(L.get_pois(n, w, r))
    assert ids(osm.get_landuse()) == ids(L.get_landuse(n, w, r))
    assert ids(osm.get_boundaries()) == ids(L.get_boundaries(n, w, r))


def test_bounding_box_flows_to_layers(spark, synth_dir, osm):
    # a bbox covering a sub-window keeps a strict subset of buildings
    full = osm.get_buildings()
    boxed = OSM(spark, synth_dir,
                bounding_box=[24.6, 60.1, 24.9, 60.25]).get_buildings()
    nf, nb = full.count(), boxed.count()
    assert 0 < nb < nf


def test_custom_criteria_keep_all_and_kinds(osm):
    out = osm.get_data_by_custom_criteria()  # keep-all mode
    kinds = {r["osm_type"] for r in out.select("osm_type").distinct().collect()}
    assert "way" in kinds
    no_ways = osm.get_data_by_custom_criteria(keep_ways=False)
    assert no_ways.filter(F.col("osm_type") == "way").count() == 0


def test_custom_criteria_exclude(osm):
    keep = osm.get_data_by_custom_criteria(
        {"highway": ["residential"]}, filter_type="keep", keep_nodes=False,
        keep_relations=False)
    excl = osm.get_data_by_custom_criteria(
        {"highway": ["residential"]}, filter_type="exclude",
        keep_nodes=False, keep_relations=False)
    inter = set(r["id"] for r in keep.select("id").collect()) & \
        set(r["id"] for r in excl.select("id").collect())
    assert inter == set()


def test_timestamp_filter(osm):
    # history semantics: nothing newer than ts survives
    out = osm.get_data_by_custom_criteria(timestamp=0)
    assert out.count() == 0 or out.filter("timestamp > 0").count() == 0


def test_to_graph(osm):
    pytest.importorskip("networkx")
    nodes, edges = osm.get_network("driving", nodes=True)
    g = osm.to_graph(nodes, edges, network_type="driving")
    assert g.number_of_edges() > 0
    # the igraph path runs the full pipeline + frame contract and fails
    # only at the constructor (lib absent in this container) with the
    # reference's own ImportError message
    with pytest.raises(ImportError, match="python-igraph"):
        osm.to_graph(nodes, edges, graph_type="igraph")
    with pytest.raises(ValueError, match="graph_type"):
        osm.to_graph(nodes, edges, graph_type="nx")


def test_tags_to_keep_and_extra_attributes(osm):
    """pyrosm.py:451-466 — tags_to_keep replaces the default column
    set; extra_attributes appends. Filtering is unaffected."""
    default = osm.get_buildings()
    narrowed = osm.get_buildings(tags_to_keep=["building"])
    widened = osm.get_buildings(extra_attributes=["height"])
    assert narrowed.count() == default.count()  # presentation only
    assert "name" not in narrowed.columns
    assert "building" in narrowed.columns
    assert set(default.columns) <= set(widened.columns) | {"height"}


def test_driving_service_alias(osm):
    """'driving+service' == the psv-inclusive driving filter
    (pyrosm.py:290-291): superset of plain driving (psv ways return)."""
    drv = {r["id"] for r in
           osm.get_network("driving").select("id").collect()}
    svc = {r["id"] for r in
           osm.get_network("driving+service").select("id").collect()}
    assert drv <= svc


def test_custom_criteria_osm_keys_and_columns(osm):
    """pyrosm.py:1019-1185 parity: osm_keys_to_keep gates candidates,
    derived tags_as_columns come from the filter keys' default lists,
    tags_as_columns= replaces them, extra_attributes appends."""
    from pyspark.sql import functions as F

    # exclude-filter over highway ways gated on the highway key — the
    # #112 drive-filter shape
    out = osm.get_data_by_custom_criteria(
        custom_filter={"highway": ["footway"]},
        osm_keys_to_keep="highway",
        filter_type="exclude",
        keep_nodes=False, keep_relations=False)
    hw = {r[0] for r in out.select(F.col("tags")["highway"]).collect()}
    assert "footway" not in hw and len(hw) > 0
    # every returned element carries the gate key
    assert out.filter(F.col("tags")["highway"].isNull()).count() == 0

    # derived presentation candidates: highway's default list
    assert "highway" in out.columns
    # explicit tags_as_columns replaces; extra_attributes appends
    out2 = osm.get_data_by_custom_criteria(
        custom_filter={"highway": True},
        tags_as_columns=["highway"],
        extra_attributes=["name"],
        keep_nodes=False, keep_relations=False)
    assert "highway" in out2.columns and "name" in out2.columns
    assert "maxspeed" not in out2.columns

    import pytest as _pt
    with _pt.raises(ValueError, match="filter_type"):
        osm.get_data_by_custom_criteria({"highway": True},
                                        filter_type="drop")
    with _pt.raises(ValueError):
        osm.get_data_by_custom_criteria({"highway": True},
                                        osm_keys_to_keep=42)


def test_custom_criteria_element_toggles_and_superset(osm):
    """Reference test_custom_filter ports: keep_nodes-only toggle,
    keep-all superset of any single-key read, and the two-level filter
    (osm_keys gate AND value filter both non-null on every row)."""
    only_nodes = osm.get_data_by_custom_criteria(
        {"amenity": True}, keep_ways=False, keep_relations=False)
    kinds = {r["osm_type"] for r in
             only_nodes.select("osm_type").distinct().collect()}
    assert kinds == {"node"}

    everything = {(r["osm_type"], r["id"]) for r in
                  osm.get_data_by_custom_criteria()
                  .select("osm_type", "id").collect()}
    single = {(r["osm_type"], r["id"]) for r in
              osm.get_data_by_custom_criteria({"building": True})
              .select("osm_type", "id").collect()}
    assert single <= everything and len(single) > 0

    # two-level: amenity value filter gated on the building key —
    # every surviving element carries BOTH keys
    two = osm.get_data_by_custom_criteria(
        custom_filter={"amenity": True},
        osm_keys_to_keep=["building"])
    assert two.filter(F.col("tags")["building"].isNull()).count() == 0
    assert two.filter(F.col("tags")["amenity"].isNull()).count() == 0


def test_custom_filter_key_outside_defaults_becomes_column(osm):
    """A filter key with no default_tags candidate list falls back to
    the key itself as the presentation column (pyrosm.py:1166-1171)."""
    out = osm.get_data_by_custom_criteria(
        {"maxspeed": True}, keep_nodes=False, keep_relations=False)
    assert "maxspeed" in out.columns
    assert out.count() > 0


def test_network_error_and_empty_area_semantics(spark, synth_dir, osm):
    """Reference test_network_parsing ports: unknown network_type
    raises; a bbox over an empty area yields an EMPTY frame (not an
    error); bbox + nodes=True keeps every edge endpoint (J9) even when
    it falls outside the box."""
    with pytest.raises(ValueError, match="network_type"):
        osm.get_network("flying")

    empty_box = OSM(spark, synth_dir,
                    bounding_box=[0.0, 0.0, 0.01, 0.01])
    assert empty_box.get_network("driving").count() == 0

    from pyrosm_spark.synth.osm import TEST_BBOX
    boxed = OSM(spark, synth_dir, bounding_box=list(TEST_BBOX))
    nodes_df, edges = boxed.get_network("driving", nodes=True)
    uv = {r["u"] for r in edges.select("u").collect()} | \
         {r["v"] for r in edges.select("v").collect()}
    ids = {r["id"] for r in nodes_df.select("id").collect()}
    assert uv <= ids and len(uv) > 0


def test_keep_metadata_toggle(spark, synth_dir):
    """Reference keep_metadata semantics: True (default) keeps
    version/timestamp on layer frames (its buildings golden expects
    them); False drops all element metadata columns."""
    with_meta = OSM(spark, synth_dir).get_buildings()
    assert {"version", "timestamp"} <= set(with_meta.columns)
    without = OSM(spark, synth_dir,
                  keep_metadata=False).get_buildings()
    assert not ({"version", "changeset", "timestamp", "visible"}
                & set(without.columns))
    # presentation/filtering unaffected
    assert with_meta.count() == without.count()


def test_conf_surface_matches_engine_presets(osm):
    """osm.conf mirrors the reference's Conf: per-key tag lists,
    network filter dicts and oneway values are views onto the presets
    the engine executes with."""
    from pyrosm_spark.operators.default_tags import TAG_COLUMNS
    from pyrosm_spark.operators.presets import (
        ONEWAY_VALUES,
        network_filter,
    )

    conf = osm.conf
    assert conf.tags.available == sorted(TAG_COLUMNS)
    assert conf.tags.building == TAG_COLUMNS["building"]
    assert "addr:city" in conf.tags.highway or \
        "highway" in conf.tags.highway
    assert conf.network_filters.driving == network_filter("driving")
    assert conf.network_filters.cycling == network_filter("cycling")
    assert conf.oneway_values == list(ONEWAY_VALUES)


def test_conf_is_per_instance_and_drives_execution(spark, synth_dir):
    """Reference-style customization: appending a key to
    osm.conf.tags.highway adds that tag column to get_network output
    for THAT instance only — conf is not a shared singleton."""
    a = OSM(spark, synth_dir)
    b = OSM(spark, synth_dir)
    assert a.conf is not b.conf
    # narrow a's highway candidate list: 'maxspeed' occurs on synth
    # driving ways, so removing it from conf must drop the column for
    # instance a while instance b keeps it (widening can't be probed
    # here — every occurring highway-way key is already a default, and
    # F9 prunes non-occurring keys regardless of conf)
    a.conf.tags.highway.remove("maxspeed")
    assert "maxspeed" in b.conf.tags.highway
    cols_a = a.get_network("driving").columns
    cols_b = b.get_network("driving").columns
    assert "maxspeed" not in cols_a
    assert "maxspeed" in cols_b


def test_conf_drives_custom_criteria_columns(spark, synth_dir):
    """get_data_by_custom_criteria derives its default presentation
    columns from THIS instance's conf.tags (pyrosm.py:1148-1167), so a
    conf mutation affects it exactly like the sibling layer methods."""
    a = OSM(spark, synth_dir)
    b = OSM(spark, synth_dir)
    a.conf.tags.highway.remove("maxspeed")
    cols_a = a.get_data_by_custom_criteria(
        {"highway": True}, keep_nodes=False, keep_relations=False).columns
    cols_b = b.get_data_by_custom_criteria(
        {"highway": True}, keep_nodes=False, keep_relations=False).columns
    assert "maxspeed" not in cols_a
    assert "maxspeed" in cols_b


def test_custom_criteria_bracket_filter_fallback_columns(osm):
    """An advanced (bracket-string) custom_filter derives presentation
    columns from the compiled filter's keys: conf.tags lists where the
    key is a known layer, the key itself otherwise."""
    out = osm.get_data_by_custom_criteria(
        '["oneway"]', keep_nodes=False, keep_relations=False)
    # 'oneway' is not a conf.tags layer -> the key itself is the column
    assert "oneway" in out.columns
    assert out.count() > 0


def test_timestamp_accepts_str_and_datetime(osm):
    """The reference's timestamp= accepts int | str | datetime
    (utils/__init__.py:314-341 get_unix_time parses non-ints via
    pandas); the facade must not crash on the documented forms."""
    import datetime

    base = osm.get_data_by_custom_criteria(
        {"highway": True}, keep_nodes=False, keep_relations=False,
        timestamp=0)
    s = osm.get_data_by_custom_criteria(
        {"highway": True}, keep_nodes=False, keep_relations=False,
        timestamp="1970-01-01")
    d = osm.get_data_by_custom_criteria(
        {"highway": True}, keep_nodes=False, keep_relations=False,
        timestamp=datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc))
    assert base.count() == s.count() == d.count()
    with pytest.raises(ValueError, match="timestamp"):
        osm.get_data_by_custom_criteria(timestamp="not a date")
    with pytest.raises(ValueError, match="timestamp"):
        osm.get_data_by_custom_criteria(timestamp=True)


def test_network_keep_metadata_toggle(spark, synth_dir):
    """keep_metadata=False drops version/timestamp from network frames
    too (networks.py:17-20 appends them only when keep_metadata), on
    both the way-level and the segment-level (nodes=True) paths."""
    meta = {"version", "timestamp", "changeset"}
    with_m = OSM(spark, synth_dir).get_network("driving")
    assert {"version", "timestamp"} <= set(with_m.columns)
    # changeset NEVER appears on network frames, even with
    # keep_metadata=True: the reference's way records don't carry it
    # (pbfreader.pyx parse_ways), so its network frames can't either —
    # and both our paths must agree
    assert "changeset" not in with_m.columns
    _, seg_m = OSM(spark, synth_dir).get_network("driving", nodes=True)
    assert {"version", "timestamp"} <= set(seg_m.columns)
    assert "changeset" not in seg_m.columns
    without = OSM(spark, synth_dir, keep_metadata=False)
    e = without.get_network("driving")
    assert not (meta & set(e.columns))
    nodes, edges = without.get_network("driving", nodes=True)
    assert not (meta & set(edges.columns))
    assert not (meta & set(nodes.columns))
    assert e.count() == with_m.count()  # presentation-only toggle


def test_keep_node_info_all_paths(spark, synth_dir):
    """osm.keep_node_info = True must expose the 'nodes' (way-refs)
    column on EVERY path the reference honors it on (pyrosm.py:185,
    490, 881, 1203): segment-level network edges, boundaries, and
    custom-criteria frames."""
    osm = OSM(spark, synth_dir)
    osm.keep_node_info = True
    _, edges = osm.get_network("driving", nodes=True)
    assert "nodes" in edges.columns
    seg = edges.filter(F.col("nodes").isNotNull()).first()
    assert seg is not None and len(seg["nodes"]) >= 2
    b = osm.get_boundaries()
    assert "nodes" in b.columns
    c = osm.get_data_by_custom_criteria(
        {"highway": True}, keep_nodes=False, keep_relations=False)
    assert "nodes" in c.columns
    # and the default stays opt-in everywhere
    osm2 = OSM(spark, synth_dir)
    _, edges2 = osm2.get_network("driving", nodes=True)
    assert "nodes" not in edges2.columns


def test_keep_ways_false_pushdown_semantics(osm):
    """keep_ways=False skips the standalone-way pipeline instead of
    post-filtering: same rows as before (no way rows, node/relation
    rows intact), but way-only tag keys no longer create all-null
    presentation columns (the reference derives columns from the kept
    elements only)."""
    full = osm.get_data_by_custom_criteria()
    no_ways = osm.get_data_by_custom_criteria(keep_ways=False)
    assert no_ways.filter(F.col("osm_type") == "way").count() == 0
    want = sorted(
        (r["osm_type"], r["id"]) for r in full.select("osm_type", "id")
        .filter(F.col("osm_type") != "way").collect())
    got = sorted((r["osm_type"], r["id"]) for r in
                 no_ways.select("osm_type", "id").collect())
    assert got == want
    # reference error-shape parity (its message, typo included)
    with pytest.raises(ValueError, match="At least on"):
        osm.get_data_by_custom_criteria(
            keep_nodes=False, keep_ways=False, keep_relations=False)


def test_present_tags_id_rename_and_collision_guard(spark):
    """A tag literally keyed 'id' lands in 'id_tag' (tagparser.pyx:
    41-44); a tag whose key collides with a structural frame column
    (geometry) must never clobber it."""
    from pyrosm_spark.functions.tags import present_tags

    df = spark.createDataFrame(
        [(1, b"\x01", {"id": "tag-value", "geometry": "oops",
                       "highway": "residential"})],
        "id long, geometry binary, tags map<string,string>")
    out = present_tags(df, ["id", "geometry", "highway"])
    row = out.first()
    assert row["id"] == 1                       # element id intact
    assert row["id_tag"] == "tag-value"         # tag exposed, renamed
    assert bytes(row["geometry"]) == b"\x01"    # structural col intact
    assert row["highway"] == "residential"


def test_bbox_geometry_form_message(spark, synth_dir):
    """A non-list bbox (e.g. a Shapely geometry) gets an actionable
    message pointing at the PIP join, not one that names the passed
    type as acceptable."""
    with pytest.raises(ValueError, match="point_in_polygon_join"):
        OSM(spark, synth_dir, bounding_box=object())
