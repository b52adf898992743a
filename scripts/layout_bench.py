"""Z-order layout scan-avoidance measurement (BENCH/BASELINE.md §layout).

Times the same bbox count over (a) the unclustered bench image table —
lon/lat predicates are pushed, but rows are written in generation order
so every file's lon/lat min/max straddles the query and no row group
can be skipped — and (b) a Morton-clustered copy read through
``scan_spatial`` — the bbox lowers to a handful of contiguous int64
key ranges and the reader opens only the row groups whose key window
intersects. The row-group counts are computed exactly from the parquet
footers, so the pruning claim is structural, not just a wall-clock
artifact of a contended host.

Usage: python scripts/layout_bench.py [src_table] [reps]
Defaults: data/bench_sf0.1/images_hl_f64.parquet (128M rows), 3 reps.
Prints ONE JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ~1% of the synth extent (lon 24.6-25.2, lat 60.1-60.4)
BBOX = (24.84, 60.18, 24.90, 60.21)
RES = 15


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "data", "bench_sf0.1", "images_hl_f64.parquet")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from pyrosm_spark import get_spark
    from pyrosm_spark.sources.layout import (
        assign_shards,
        bbox_morton_ranges_py,
        matching_row_groups,
        morton_key,
        scan_spatial,
        write_spatial_clustered,
    )

    spark = get_spark("layout_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    clustered = src.rstrip("/") + f".zorder_r{RES}"
    t_write = None
    if not os.path.exists(os.path.join(clustered, "_SUCCESS")):
        t0 = time.time()
        # one range shuffle + per-partition sort; file count matches the
        # source so per-file row-group geometry is comparable
        n_files = len(glob.glob(os.path.join(src, "*.parquet")))
        write_spatial_clustered(spark.read.parquet(src), clustered,
                                res=RES, num_files=max(n_files, 32))
        t_write = round(time.time() - t0, 3)

    x0, y0, x1, y1 = BBOX
    base = spark.read.parquet(src)

    def run(fn):
        best, out = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), out

    t_plain, n_plain = run(lambda: base.filter(
        F.col("lon").between(x0, x1) & F.col("lat").between(y0, y1)
    ).count())
    t_z, n_z = run(lambda: scan_spatial(
        spark, clustered, bbox=BBOX, res=RES).count())
    assert n_plain == n_z, (n_plain, n_z)

    ranges = bbox_morton_ranges_py(BBOX, RES)
    m, tot = matching_row_groups(clustered, ranges)
    total_rows = base.count()

    # training-shard assignment: the bucketed two-pass design vs the
    # naive single global window (ONE task sorts the corpus — the
    # formulation assign_shards exists to avoid). Shard ids are equal
    # by test; this measures only the plan shape's cost.
    keyed = (base.select("image_id", "lon", "lat")
             .withColumn("_zkey", morton_key(
                 F.col("lon"), F.col("lat"), RES)))
    t_shard, n_shard = run(lambda: assign_shards(
        keyed, 100_000, "_zkey", "image_id", n_buckets=4096)
        .groupBy("shard").count().count())

    def global_window():
        from pyspark.sql import Window
        w = Window.orderBy(F.col("_zkey").asc(), F.col("image_id").asc())
        return (keyed
                .withColumn("shard", ((F.row_number().over(w) - 1)
                                      / 100_000).cast("long"))
                .groupBy("shard").count().count())

    t_naive, n_naive = run(global_window)
    assert n_shard == n_naive, (n_shard, n_naive)
    print(json.dumps({
        "metric": "zorder_bbox_scan",
        "src": os.path.basename(src),
        "rows_total": total_rows,
        "rows_in_bbox": n_z,
        "reps": reps,
        "cpus": int(cpus),
        "t_unclustered_sec": t_plain,
        "t_zorder_sec": t_z,
        "speedup": round(t_plain / max(t_z, 1e-9), 2),
        "clustered_write_sec": t_write,
        "morton_ranges": len(ranges),
        "rowgroups_matched": m,
        "rowgroups_total": tot,
        "rowgroups_fraction": round(m / max(tot, 1), 4),
        "n_shards": n_shard,
        "t_shards_bucketed_sec": t_shard,
        "t_shards_global_window_sec": t_naive,
        "shards_speedup": round(t_naive / max(t_shard, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
