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


def test_stateful_cell_counts_matches_batch(spark, synth_dir):
    """applyInPandasWithState running totals: the LAST emitted row per
    cell must equal the batch groupBy totals."""
    from pyspark.sql import functions as F

    from pyrosm_spark.functions import tiles
    from pyrosm_spark.streaming.ingest import (
        read_images_stream,
        run_to_memory,
        stateful_cell_counts,
    )

    img_path = os.path.join(synth_dir, "images.parquet")
    stream = read_images_stream(spark, img_path, max_files_per_trigger=1)
    out = stateful_cell_counts(stream, res=12)
    run_to_memory(out, "cell_state", output_mode="update")
    rows = spark.sql("SELECT * FROM cell_state").collect()
    # keep the max (= final cumulative) per cell
    final = {}
    for r in rows:
        cur = final.get(r["cell"])
        if cur is None or r["n_images"] > cur[0]:
            final[r["cell"]] = (r["n_images"], r["total_bytes"])

    batch = (
        spark.read.parquet(img_path)
        .select(
            F.when(F.col("bytes").isNotNull(),
                   F.length("bytes")).otherwise(0).alias("nbytes"),
            tiles.cell_id(F.col("lon"), F.col("lat"), 12).alias("cell"),
        )
        .groupBy("cell")
        .agg(F.count("*").alias("n"), F.sum("nbytes").alias("b"))
    )
    exp = {r["cell"]: (r["n"], r["b"]) for r in batch.collect()}
    assert final == exp and len(exp) > 10


def test_streaming_exact_dedup_first_arrival(spark, synth_dir):
    """Streaming content dedup: per content key exactly one survivor;
    survivor count equals the batch distinct-key count."""
    import os

    from pyrosm_spark.streaming.ingest import (
        read_images_stream, run_to_memory, streaming_exact_dedup)

    path = os.path.join(synth_dir, "images.parquet")
    stream = read_images_stream(spark, path, max_files_per_trigger=1)
    run_to_memory(streaming_exact_dedup(stream), "dedup_stream",
                  output_mode="append")
    got = spark.sql("SELECT * FROM dedup_stream")
    batch = spark.read.parquet(path)
    # oracle mirrors the operator's key ladder (null-safe phash/w/h
    # parts; md5(bytes) / id / uuid fallbacks for NULL phash)
    n_keys = (batch.selectExpr(
        "CASE WHEN phash IS NOT NULL THEN concat_ws(':', 'p', "
        "  coalesce(cast(phash AS string), '\\0'), "
        "  coalesce(cast(w AS string), '\\0'), "
        "  coalesce(cast(h AS string), '\\0')) "
        "WHEN bytes IS NOT NULL THEN concat('b:', md5(bytes)) "
        "WHEN image_id IS NOT NULL THEN concat('id:', image_id) "
        "ELSE concat('u:', uuid()) END AS k")
        .distinct().count())
    assert got.count() == n_keys
    assert got.select("content_key").distinct().count() == n_keys


def test_streaming_dedup_key_ladder_null_safety(spark, tmp_path):
    """NULL w/h must not collide distinct keys (concat_ws drops NULLs);
    rows with nothing known must never dedupe against each other."""
    import pandas as pd

    from pyrosm_spark.streaming.ingest import streaming_exact_dedup

    rows = [
        ("a", b"x1", None, 640, 5, 0.0, 0.0),   # phash 5, w NULL
        ("b", b"x2", 640, None, 5, 0.0, 0.0),   # phash 5, h NULL
        ("c", b"x3", 640, None, 5, 0.0, 0.0),   # true dup of b
        ("d", b"same", None, None, None, 0.0, 0.0),  # unknown, by bytes
        ("e", b"same", None, None, None, 0.0, 0.0),  # dup of d by bytes
        ("f", b"diff", None, None, None, 0.0, 0.0),  # distinct bytes
        (None, None, None, None, None, 0.0, 0.0),    # nothing known
        (None, None, None, None, None, 0.0, 0.0),    # nothing known
    ]
    pdf = pd.DataFrame(rows, columns=[
        "image_id", "bytes", "w", "h", "phash", "lon", "lat"])
    df = spark.createDataFrame(pdf).withColumn(
        "fmt", F.lit("png")).withColumn("caption", F.lit(""))
    out = streaming_exact_dedup(df).collect()
    ids = sorted(str(r["image_id"]) for r in out)
    # a vs b: different null slots -> both kept; c dedupes into b;
    # d/e collapse on bytes; f kept; both all-NULL rows kept (uuid)
    assert ids == ["None", "None", "a", "b", "d", "f"]


def test_streaming_pip_equals_batch(spark, synth_dir, tmp_path_factory):
    """Stream-static PIP join == the batch join on the same rows."""
    from pyrosm_spark.operators.layers import get_buildings
    from pyrosm_spark.operators.osm_source import load_osm
    from pyrosm_spark.operators.spatial_join import point_in_polygon_join
    from pyrosm_spark.streaming.ingest import (
        read_images_stream,
        run_to_memory,
        streaming_pip_join,
    )

    nodes, ways, rels = load_osm(spark, synth_dir)
    polygons = get_buildings(nodes, ways, rels).select(
        "id", "osm_type", "geometry").cache()
    polygons.count()

    img_path = f"{synth_dir}/images.parquet"
    stream = read_images_stream(spark, img_path)
    out = streaming_pip_join(stream, polygons, res=15).select(
        "image_id", "poly_id", "poly_osm_type")
    run_to_memory(out, "q_stream_pip", output_mode="append")
    got = {(r["image_id"], r["poly_id"], r["poly_osm_type"])
           for r in spark.sql("SELECT * FROM q_stream_pip").collect()}

    batch = point_in_polygon_join(
        spark.read.parquet(img_path), polygons, res=15
    ).select("image_id", "poly_id", "poly_osm_type")
    exp = {(r["image_id"], r["poly_id"], r["poly_osm_type"])
           for r in batch.collect()}
    assert got == exp and len(exp) > 0
