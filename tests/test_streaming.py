"""Structured Streaming paths: stream results == batch results."""

import os

import pytest
from pyspark.sql import functions as F

from pyrosm_spark.streaming.ingest import (
    read_events_stream,
    read_images_stream,
    run_to_memory,
    streaming_tile_assignment,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_stream_matches_batch(spark):
    ev_stream = read_events_stream(spark, os.path.join(SF_DIR,
                                                       "events.parquet"))
    agg = windowed_event_counts(ev_stream)
    run_to_memory(agg, "win_counts", output_mode="complete")
    got = {(r["win_start"], r["event_type"]): (r["n"], r["v"])
           for r in spark.sql("SELECT * FROM win_counts").collect()}

    batch = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    exp_df = windowed_event_counts(batch)
    exp = {(r["win_start"], r["event_type"]): (r["n"], r["v"])
           for r in exp_df.collect()}
    assert got == exp and len(got) > 10


def test_streaming_tile_assignment_matches_batch(spark, synth_dir):
    from pyrosm_spark.operators.spatial_join import assign_tiles

    img_path = os.path.join(synth_dir, "images.parquet")
    stream = read_images_stream(spark, img_path)
    run_to_memory(streaming_tile_assignment(stream, 15), "tiles_stream",
                  output_mode="append")
    got = {r["image_id"]: r["cell"] for r in
           spark.sql("SELECT * FROM tiles_stream").collect()}
    batch = assign_tiles(spark.read.parquet(img_path), 15)
    exp = {r["image_id"]: r["cell"] for r in
           batch.select("image_id", "cell").collect()}
    assert got == exp
