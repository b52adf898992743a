"""Crop cascade, complete_relations switch, caption round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from pyrosm_spark.operators.crop import crop_tables
from pyrosm_spark.operators.osm_source import load_osm
from pyrosm_spark.synth.osm import TEST_BBOX

from tests import oracle


def test_crop_cascade_matches_oracle(spark, synth_dir):
    nodes, ways, rels = load_osm(spark, synth_dir)
    n, w, r = crop_tables(nodes, ways, rels, TEST_BBOX)
    got_n = {x["id"] for x in n.select("id").collect()}
    got_w = {x["id"] for x in w.select("id").collect()}
    got_r = {x["id"] for x in r.select("id").collect()}

    nrows = oracle.load_rows(f"{synth_dir}/osm_nodes.parquet")
    wrows = oracle.load_rows(f"{synth_dir}/osm_ways.parquet")
    rrows = oracle.load_rows(f"{synth_dir}/osm_relations.parquet")
    x0, y0, x1, y1 = TEST_BBOX
    inbox = {nn["id"] for nn in nrows if nn["visible"]
             and x0 <= nn["lon"] <= x1 and y0 <= nn["lat"] <= y1}
    exp_w = {ww["id"] for ww in wrows if ww["visible"]
             and any(rf in inbox for rf in ww["refs"])}
    closure = set(inbox)
    for ww in wrows:
        if ww["id"] in exp_w:
            closure.update(ww["refs"])
    exp_n = {nn["id"] for nn in nrows if nn["visible"] and nn["id"] in closure}
    exp_r = set()
    for rr in rrows:
        if not rr["visible"]:
            continue
        for m in rr["members"]:
            if (m["member_type"] == "node" and m["member_id"] in closure) or \
               (m["member_type"] == "way" and m["member_id"] in exp_w):
                exp_r.add(rr["id"])
                break
    assert got_w == exp_w and len(exp_w) > 0
    assert got_n == exp_n
    assert got_r == exp_r and len(exp_r) > 0
    # consistency: every ref of every kept way resolves in kept nodes
    # unless globally missing
    all_node_ids = {nn["id"] for nn in nrows if nn["visible"]}
    for ww in wrows:
        if ww["id"] in exp_w:
            for rf in ww["refs"]:
                if rf in all_node_ids:
                    assert rf in got_n


def test_complete_relations_switch(spark, synth_dir):
    """J6: without complete_relations, out-of-box member ways are
    excluded from relation assembly; with it they participate."""
    from pyrosm_spark.operators.layers import get_layer

    nodes, ways, rels = load_osm(spark, synth_dir)
    # BoxStraddler relation crosses the TEST_BBOX edge
    partial = get_layer(nodes, ways, rels, {"landuse": True},
                        include_nodes=False, bbox=TEST_BBOX,
                        complete_relations=False, tag_cols=("name",))
    complete = get_layer(nodes, ways, rels, {"landuse": True},
                         include_nodes=False, bbox=TEST_BBOX,
                         complete_relations=True, tag_cols=("name",))
    p_rows = {r["name"] for r in partial.filter(
        F.col("osm_type") == "relation").select("name").collect()}
    c_rows = {r["name"] for r in complete.filter(
        F.col("osm_type") == "relation").select("name").collect()}
    # the straddler's ring way has in-box nodes -> present in both;
    # complete mode must be a superset of partial mode
    assert p_rows <= c_rows
    assert "BoxStraddler" in c_rows


def test_caption_roundtrip_through_checkpoint(spark, synth_dir, tmp_path):
    """input_hint invariant: caption byte-equality through a full
    engine write/read cycle (checkpointed stage)."""
    from pyrosm_spark.plans.checkpoint import CheckpointManager

    src_path = os.path.join(synth_dir, "images.parquet")
    cp = CheckpointManager(spark, str(tmp_path / "ckpt"))
    out = cp.stage(
        "img_passthrough", {"v": 1}, [src_path],
        lambda: spark.read.parquet(src_path).select("image_id", "caption",
                                                    "phash"),
    )
    got = {r["image_id"]: r["caption"] for r in out.collect()}
    import pyarrow.parquet as pq

    exp = {r["image_id"]: r["caption"]
           for r in pq.read_table(src_path).to_pylist()}
    assert got == exp


def test_crop_to_dataset_roundtrip(spark, synth_dir, tmp_path):
    """Crop -> persisted dataset -> load_osm reads it like any world;
    the reread triple row-matches the in-memory crop, and a network
    query over the crop equals the same query over the in-memory
    frames (the reference's crop-then-reopen workflow, container
    format aside)."""
    from pyrosm_spark.operators.crop import crop_tables, crop_to_dataset
    from pyrosm_spark.operators.network import get_network
    from pyrosm_spark.operators.osm_source import load_osm
    from pyrosm_spark.synth.osm import TEST_BBOX

    nodes, ways, rels = load_osm(spark, synth_dir)
    out = str(tmp_path / "cropped")
    counts = crop_to_dataset(nodes, ways, rels, TEST_BBOX, out)
    n2, w2, r2 = load_osm(spark, out)
    assert n2.count() == counts["osm_nodes"] > 0
    assert w2.count() == counts["osm_ways"] > 0
    assert r2.count() == counts["osm_relations"] > 0

    cn, cw, cr = crop_tables(nodes, ways, rels, TEST_BBOX)
    direct = sorted(r["id"] for r in
                    get_network(cn, cw, "driving").select("id").collect())
    reread = sorted(r["id"] for r in
                    get_network(n2, w2, "driving").select("id").collect())
    assert direct == reread and len(reread) > 0

    # file: URI out_dirs — BOTH legal local forms must produce the
    # same manifest as the plain path (a fixed 7-char scheme slice
    # used to mangle the single-slash form into a 0-count walk)
    for uri in (f"file:{tmp_path}/crop_u1", f"file://{tmp_path}/crop_u2"):
        got = crop_to_dataset(nodes, ways, rels, TEST_BBOX, uri)
        assert got == counts, uri
