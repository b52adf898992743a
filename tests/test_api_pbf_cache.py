"""Facade parity: OSM.to_pbf crop-export (pyrosm.py:1208-1285) and the
cache/downloads management statics (pyrosm.py:1542-1617)."""

import os

import pytest
from pyspark.sql import functions as F

from pyrosm_spark.api import OSM
from pyrosm_spark.sources import pbf


def test_to_pbf_requires_bbox(spark, synth_dir):
    osm = OSM(spark, synth_dir)
    with pytest.raises(ValueError, match="bounding box"):
        osm.to_pbf()


def test_to_pbf_crops_and_rereads(spark, synth_dir, tmp_path):
    bbox = [24.7, 60.15, 25.0, 60.3]
    osm = OSM(spark, synth_dir, bounding_box=bbox)
    out = str(tmp_path / "cropped.osm.pbf")
    got = osm.to_pbf(output_path=out, workers=4, compact=True)
    assert got == out and os.path.getsize(out) > 0

    from pyrosm_spark.operators.crop import crop_tables

    nodes, ways, rels = osm._src()
    kn, kw, kr = crop_tables(nodes, ways, rels, tuple(bbox))
    n2, w2, r2 = pbf.read_pbf(spark, out)
    assert n2.count() == kn.count()
    assert w2.count() == kw.count()
    assert r2.count() == kr.count()
    # complete-ways: every kept-way ref that resolves in the SOURCE
    # resolves in the crop (refs dangling in the source — e.g. deleted
    # nodes in a history world — stay dangling, as in the reference)
    missing = (w2.select(F.explode("refs").alias("id"))
               .join(nodes.select("id"), "id", "left_semi")
               .join(n2.select("id"), "id", "left_anti").count())
    assert missing == 0

    # keep_relations=False drops stage 3 but not nodes/ways
    out2 = str(tmp_path / "norels.osm.pbf")
    osm.to_pbf(output_path=out2, keep_relations=False)
    n3, w3, r3 = pbf.read_pbf(spark, out2)
    assert r3.count() == 0
    assert n3.count() == kn.count() and w3.count() == kw.count()


def test_to_pbf_temp_default(spark, synth_dir):
    osm = OSM(spark, synth_dir, bounding_box=[24.7, 60.15, 25.0, 60.3])
    path = osm.to_pbf()
    try:
        assert path.endswith(".osm.pbf") and os.path.getsize(path) > 0
    finally:
        os.remove(path)


def test_cache_statics_roundtrip(spark, synth_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("PYROSM_SPARK_CACHE_DIR", str(tmp_path / "cache"))
    assert OSM.list_cache() == []
    assert OSM.clear_cache() == 0

    from pyrosm_spark.plans.checkpoint import CheckpointManager

    cp = CheckpointManager(spark)  # default root -> env-pointed dir
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    cp.stage("tiny", {"k": 1}, inputs=[], fn=lambda: df)
    listed = OSM.list_cache()
    assert len(listed) == 1 and listed[0].startswith(str(tmp_path / "cache"))
    assert OSM.clear_cache() == 1
    assert OSM.list_cache() == []


def test_downloads_statics(spark):
    from pyrosm_spark.data import get_data

    p = get_data("test_pbf")
    assert p in OSM.list_downloads()
    assert OSM.clear_downloads() >= 1
    assert OSM.list_downloads() == []
    # re-materialize for other tests (deterministic, regenerable)
    p2 = get_data("test_pbf")
    assert os.path.exists(p2)
