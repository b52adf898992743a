"""Offline dataset catalog (reference pyrosm.data get_data/available)."""

import os

import pytest

from pyrosm_spark.data import available, get_data, get_path


def test_available_lists_bundled():
    assert "bundled" in available
    assert "test_pbf" in available["bundled"]
    assert "test_world" in available["bundled"]


def test_get_data_world_dir(spark):
    d = get_data("test_world")
    assert os.path.isdir(d)
    assert os.path.exists(os.path.join(d, "osm_nodes.parquet"))


def test_get_data_pbf_loadable(spark):
    p = get_data("test_pbf")
    assert p.endswith(".osm.pbf") and os.path.exists(p)
    assert get_path("synth_pbf") == p
    from pyrosm_spark.api import OSM

    osm = OSM(spark, p)
    n = osm.get_network("driving").count()
    assert n > 0


def test_get_data_update_rematerializes(spark):
    """update=True must force regeneration of the parquet element
    tables too (not only the pbf container): stale artifacts get a
    fresh mtime."""
    d = get_data("test_world")
    marker = os.path.join(d, "osm_nodes.parquet")
    before = os.path.getmtime(marker)
    d2 = get_data("test_world", update=True)
    assert d2 == d
    assert os.path.exists(marker)
    assert os.path.getmtime(marker) >= before
    # and the pbf materializer still works after the wipe
    p = get_data("test_pbf")
    assert os.path.exists(p)


def test_unknown_name_reference_error():
    with pytest.raises(ValueError, match="Could not retrieve url for"):
        get_data("atlantis")


def test_remote_name_targeted_error():
    with pytest.raises(ValueError, match="out of scope"):
        get_data("finland")
