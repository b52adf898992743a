"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: spatial-join + tile-assignment rows/sec over the
image table (BASELINE.json's primary metric), measured as
n_images / (t_tile_assign + t_pip_join). Component queries cover the
rest of the engine: network extraction, buildings, kNN, minhash LSH,
phash dedup, image decode.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) picks the
driver-table scale; bench-scale synthetic OSM/images tables are
generated once per sf into data/bench_<sf>/ (deterministic, cached).
SPARK_GRAFT_CPUS sets local parallelism (the scaling harness runs this
script at 2 and 8 — inside the host's physical-core budget — to
evidence the north rule's two-cluster-size criterion; see
scripts/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_bench_data(sf: float) -> tuple:
    """Deterministic bench-scale synth tables, cached per sf."""
    from pyrosm_spark.synth import ensure_images_table, ensure_osm_tables

    out = os.path.join(REPO, "data", f"bench_sf{sf}")
    n_images = max(int(20_000_000 * sf), 40_000)
    grid = max(int(64 * (sf / 0.1) ** 0.5), 24)
    # SPARK_GRAFT_OSM_GRID: denser OSM world for scaling runs — the
    # default grid's network/buildings queries finish in ~1 s, which is
    # pure fixed cost at both parallelism levels (same rationale as
    # HL_FACTOR / DOC_FACTOR). ensure_osm_tables caches by existence
    # only, so a non-default grid gets its own subdirectory.
    grid = int(os.environ.get("SPARK_GRAFT_OSM_GRID", grid))
    osm_dir = out
    if grid != max(int(64 * (sf / 0.1) ** 0.5), 24):
        osm_dir = os.path.join(out, f"osm_g{grid}")
    ensure_osm_tables(osm_dir, grid=grid, seed=42)
    ensure_images_table(
        os.path.join(out, "images.parquet"),
        n_rows=n_images,
        seed=42,
        bytes_every=max(n_images // 10_000, 1),
        rows_per_file=25_000,  # multi-file: scan parallelism
    )
    # headline-only table, hl_factor x rows, no binary payloads: the
    # spatial-join measurement needs enough compute per level that the
    # per-query constant (JVM/codegen/scan setup, ~0.5-1.5 s) doesn't
    # dominate the scaling ratio; payload-dependent queries keep the 1x
    # table. SPARK_GRAFT_HL_FACTOR raises it further for scaling runs
    # (scripts/scaling_bench.py uses 16x so the fixed overhead amortizes
    # the way it would at the rule's 10^12-row regime).
    hl_factor = int(os.environ.get("SPARK_GRAFT_HL_FACTOR", "4"))
    n_hl = hl_factor * n_images
    hl_name = ("images_hl.parquet" if hl_factor == 4
               else f"images_hl_f{hl_factor}.parquet")
    ensure_images_table(
        os.path.join(out, hl_name),
        n_rows=n_hl,
        seed=43,
        bytes_every=n_hl,  # a single payload row: geometry-only workload
        rows_per_file=50_000,
    )
    return out, hl_name, osm_dir


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    bench_dir, hl_name, osm_dir = ensure_bench_data(sf)

    from pyspark.sql import functions as F

    from pyrosm_spark.operators.dedup import minhash_lsh_pairs, phash_pairs
    from pyrosm_spark.operators.layers import get_buildings
    from pyrosm_spark.operators.multimodal import decode_features
    from pyrosm_spark.operators.network import get_network
    from pyrosm_spark.operators.osm_source import load_osm
    from pyrosm_spark.operators.spatial_join import (
        assign_tiles,
        knn_join,
        point_in_polygon_join,
        raster_polygon_join,
    )
    from pyrosm_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    saved_confs: dict = {}

    def small_file_confs(on: bool):
        """CPU-heavy rows, small bytes (docs/images dedup + decode):
        without 4 MB splits, one 30 MB scan becomes 1 input split and
        AQE coalesces shuffles to 1-2 partitions — parallelism
        evaporates regardless of cores. But the same conf fragments the
        8M-row headline table into 160 splits whose per-task Arrow
        overhead dominates the PIP refine (observed 1.9s -> 6.2s), so
        it is scoped to the queries that need it: these are runtime
        confs read at file-scan/AQE planning, per query. Restore puts
        back the SESSION's configured values (conf.unset would revert
        to Spark's hard defaults — e.g. a 64 MB AQE advisory instead
        of session.py's deliberate 4 MB — silently degrading any
        query timed after the first toggle cycle)."""
        keys = ("spark.sql.files.maxPartitionBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        if on:
            for k in keys:
                if k not in saved_confs:
                    saved_confs[k] = spark.conf.get(k, None)
            spark.conf.set(keys[0], str(4 * 1024 * 1024))
            spark.conf.set(keys[1], str(1024 * 1024))
        else:
            for k in keys:
                prev = saved_confs.get(k)
                if prev is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, prev)

    images = spark.read.parquet(os.path.join(bench_dir, "images.parquet"))
    images_hl = spark.read.parquet(
        os.path.join(bench_dir, hl_name))
    nodes, ways, rels = load_osm(spark, osm_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # LSH-only corpus: the sf docs table (5k rows at sf0.1) is pure
    # fixed cost for a dedup bench — the query measured nothing but
    # JVM/stage setup and could not exhibit scaling (r3 verdict).
    # Deterministic 16x replication (suffixed ids; replicas form real
    # dup cliques, exactly the shape dedup meets at corpus scale)
    # gives the banded self-join measurable work, same rationale as
    # the headline table's SPARK_GRAFT_HL_FACTOR.
    doc_factor = int(os.environ.get("SPARK_GRAFT_DOC_FACTOR", "16"))
    docs_lsh = docs
    if doc_factor > 1:
        docs_lsh = (
            docs.crossJoin(
                spark.range(doc_factor).withColumnRenamed("id", "rep"))
            .withColumn("doc_id", F.concat_ws(
                "_", F.col("doc_id").cast("string"), "rep"))
            .drop("rep"))
    n_images = images_hl.count()

    # polygons for the PIP join: buildings (way+relation features)
    polygons = get_buildings(nodes, ways, rels).select(
        "id", "osm_type", "geometry").cache()
    n_polys = polygons.count()  # materialize outside the timed window

    # warmup: exercise scan + shuffle + Arrow paths once so the first
    # timed query doesn't pay JVM/JIT/Python-worker startup
    assign_tiles(images_hl, 12).groupBy("cell").count().count()
    point_in_polygon_join(images_hl.limit(20_000), polygons, res=17).count()

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    timings: dict = {}
    all_timings: dict = {}

    def bench(name, fn):
        """min-of-N timing (SPARK_GRAFT_REPS, default 3): this host
        shows 2-5x wall swings from contention, so single-shot numbers
        made round-over-round deltas undecidable (round-2 verdict);
        per-query minima at a fixed parallelism are the stable
        statistic. Row counts come from the first repetition."""
        # hand the previous query's operator-pinned caches back before
        # timing this one (the documented between-pipeline-stages
        # call): without it, phash/minhash time their banded builds
        # under the storage pressure of every earlier query's pins —
        # measured 10.9 s suite-context vs 5.1 s standalone for the
        # same phash plan. The explicit polygons .cache() is untouched.
        from pyrosm_spark.operators.spatial_join import (
            release_pinned_caches,
        )
        release_pinned_caches()
        runs = []
        out = None
        for i in range(max(reps, 1)):
            t0 = time.time()
            got = fn()
            runs.append(round(time.time() - t0, 3))
            if i == 0:
                out = got
        timings[name] = min(runs)
        all_timings[name] = runs
        return out

    # headline components (4x geometry-only table) -----------------------
    n_tiles = bench("q_tile_assign", lambda: (
        assign_tiles(images_hl, 15).groupBy("cell").count().count()))
    # res 17 (~300 m cells): measured optimum for building-scale
    # polygons at this density — candidates drop 64.9M -> 7.5M vs
    # res 15 with only 2x the (broadcast) cover; res 18 doubles the
    # cover again for flat returns. Output is res-invariant.
    n_pip = bench("q_pip_join", lambda: point_in_polygon_join(
        images_hl, polygons, res=17).count())
    # kNN over POI nodes
    pois = nodes.filter(F.map_contains_key("tags", "amenity")).select(
        "id", "lon", "lat")
    knn_sample = images.select("image_id", "lon", "lat").filter(
        F.pmod(F.xxhash64("image_id"), F.lit(4)) == 0)
    n_knn = bench("q_knn", lambda: knn_join(
        knn_sample, pois, k=3, res=14, ring=1,
        point_id_col="image_id").count())
    # raster-tile <-> polygon join (north rule): the headline corpus
    # aggregated to res-14 tiles, each joined to every intersecting
    # polygon with the exact codegen square-vs-polygon test
    raster_tiles = assign_tiles(images_hl, 14).groupBy("cell").agg(
        F.count("*").alias("n_images"))
    n_raster = bench("q_raster_polygon", lambda: raster_polygon_join(
        raster_tiles, polygons, res=14).count())

    # engine queries ------------------------------------------------------
    n_edges = bench("q_network_driving", lambda: get_network(
        nodes, ways, "driving").count())
    # full end-to-end build, NOT the cached PIP-side copy (which would
    # time a cached count): filter -> coordinate join -> relation
    # assembly -> geometry WKB, fresh plan each run
    bench("q_buildings", lambda: get_buildings(nodes, ways, rels)
          .select("id", "osm_type", "geometry").count())
    small_file_confs(True)
    n_lsh = bench("q_minhash_lsh", lambda: minhash_lsh_pairs(
        docs_lsh, n_blocks=4).count())
    n_ph = bench("q_phash_pairs", lambda: phash_pairs(
        images, n_blocks=8).count())
    n_dec = bench("q_decode_features", lambda: decode_features(
        images, sample_ratio=1.0).filter("ok").count())
    small_file_confs(False)

    spatial_sec = timings["q_tile_assign"] + timings["q_pip_join"]
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "spatial_join_tile_assignment_rows_per_sec",
        "value": round(n_images / max(spatial_sec, 1e-9), 1),
        "unit": "rows/sec",
        "queries": timings,
        "sf": sf,
        "total_sec": total,
        "cpus": cpus,
        "reps": reps,
        "queries_all_reps": all_timings,
        "n_images": n_images,
        "n_polygons": n_polys,
        # corpus replication factors: doc_factor scales the dedup corpus
        # (q_minhash_lsh / q_phash_pairs candidate-pair counts grow
        # ~quadratically in it), hl_factor the headline image table —
        # timings/row counts are only comparable at equal factors.
        "doc_factor": doc_factor,
        "hl_factor": int(os.environ.get("SPARK_GRAFT_HL_FACTOR", "4")),
        "rows": {"tiles": n_tiles, "pip": n_pip, "knn": n_knn,
                 "raster_pairs": n_raster,
                 "edges": n_edges, "lsh_pairs": n_lsh,
                 "phash_pairs": n_ph, "decoded": n_dec},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
