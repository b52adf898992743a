"""spark-submit entry point — north-rule deployment evidence.

The rule requires the engine to "run via spark-submit --py-files on a
multi-executor cluster". This is the application script for that
launch mode: it does NOT import the repo from the filesystem — the
``pyrosm_spark`` package must arrive via ``--py-files pyrosm_spark.zip``
exactly as it would on a real cluster, so the smoke proves the package
is self-contained (no repo-relative paths, no driver-local imports in
executor code, synth generator included).

    /opt/spark/bin/spark-submit --master local[2] \
        --py-files /tmp/pyrosm_spark.zip \
        scripts/submit_smoke.py /tmp/smoke_data

Prints one JSON line with the headline counts (tile groups, PIP match
rows, driving edges, decoded images) and exits non-zero on failure.
(Reference deployment surface: pyrosm is a pip package driven by a
single process — pyrosm.py:1-60; the Spark-native equivalent is a
zip-shipped package + spark-submit.)
"""

from __future__ import annotations

import json
import sys
import os
import tempfile


def main() -> None:
    data_dir = (sys.argv[1] if len(sys.argv) > 1
                else tempfile.mkdtemp(prefix="pyrosm_spark_smoke_"))

    # Deliberately NOT pyrosm_spark.session.get_spark(): spark-submit
    # owns master/conf; the app must work with a vanilla getOrCreate.
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("pyrosm-spark-submit-smoke")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    from pyrosm_spark.synth import ensure_images_table, ensure_osm_tables
    from pyrosm_spark.operators.osm_source import load_osm
    from pyrosm_spark.operators.layers import get_buildings
    from pyrosm_spark.operators.network import get_network
    from pyrosm_spark.operators.multimodal import decode_features
    from pyrosm_spark.operators.spatial_join import (
        assign_tiles, point_in_polygon_join)

    ensure_osm_tables(data_dir, grid=16, seed=42)
    img_path = os.path.join(data_dir, "images.parquet")
    ensure_images_table(img_path, n_rows=500, seed=42)

    nodes, ways, rels = load_osm(spark, data_dir)
    images = spark.read.parquet(img_path)

    tiles = assign_tiles(images, res=12).groupBy("cell").count().count()
    polys = get_buildings(nodes, ways, rels).select(
        "id", "osm_type", "geometry")
    pip = point_in_polygon_join(images, polys, res=15).count()
    edges = get_network(nodes, ways, "driving").count()
    # executor-side import proof: a pyrosm_spark Arrow kernel runs
    # inside mapInPandas tasks, so the zip really reached the workers
    decoded = decode_features(images).filter("ok").count()

    out = {"ok": bool(tiles and pip and edges and decoded),
           "tiles": tiles, "pip": pip, "edges": edges,
           "decoded": decoded, "master": spark.sparkContext.master}
    print(json.dumps(out))
    spark.stop()
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
