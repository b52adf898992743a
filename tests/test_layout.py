"""Z-order spatial layout: key parity, range algebra, clustered-scan
pruning (sources/layout.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pyrosm_spark.functions.tiles import encode_py
from pyrosm_spark.sources.layout import (
    _merge_ranges,
    bbox_morton_ranges_py,
    cell_morton_range_py,
    matching_row_groups,
    morton_key,
    morton_key_sql,
    morton_py,
    read_layout_meta,
    scan_spatial,
    write_spatial_clustered,
)

BBOX = (-10.0, 20.0, 15.0, 45.0)
RES = 12


def _points(spark, n=50_000):
    """Deterministic pseudo-random points, no RNG: multiplicative-hash
    the row id into lon/lat so the layout has global spatial mixing
    (the worst case for an unclustered scan)."""
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761 % 360000) / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 40503 % 180000) / 1000.0 - 90.0).alias("lat"),
    )


def test_morton_key_matches_python_and_sql(spark):
    df = _points(spark, 2_000).withColumn(
        "z", morton_key(F.col("lon"), F.col("lat"), RES))
    rows = df.collect()
    for r in rows[:500]:
        assert r.z == morton_py(r.lon, r.lat, RES), (r.lon, r.lat)
    pdf = df.toPandas()
    got = duckdb.sql(
        f"SELECT {morton_key_sql('lon', 'lat', RES)} AS z FROM pdf"
    ).df()["z"]
    assert (got.to_numpy() == pdf["z"].to_numpy()).all()


def test_cell_morton_range_contains_descendants():
    # every point's res-RES morton key falls inside the window of any
    # ancestor cell that contains the point
    pts = [(-9.99, 20.01), (0.0, 30.0), (14.99, 44.99), (7.3, 21.7)]
    for lon, lat in pts:
        z = morton_py(lon, lat, RES)
        for p in (0, 3, 7, RES):
            lo, hi = cell_morton_range_py(encode_py(lon, lat, p), RES)
            assert lo <= z <= hi, (lon, lat, p)
    with pytest.raises(ValueError):
        cell_morton_range_py(encode_py(0, 0, RES + 1), RES)


def test_merge_ranges():
    assert _merge_ranges([(5, 9), (0, 2), (3, 4), (12, 14)]) == [
        (0, 9), (12, 14)]
    assert _merge_ranges([(0, 10), (2, 3)]) == [(0, 10)]
    assert _merge_ranges([]) == []


def test_bbox_ranges_bounded_and_complete(spark):
    ranges = bbox_morton_ranges_py(BBOX, RES, max_ranges=64)
    assert 0 < len(ranges) <= 64
    # completeness: every in-bbox point's key is inside some range
    df = _points(spark, 20_000).filter(
        F.col("lon").between(BBOX[0], BBOX[2])
        & F.col("lat").between(BBOX[1], BBOX[3]))
    keys = [r.z for r in df.select(morton_key(
        F.col("lon"), F.col("lat"), RES).alias("z")).collect()]
    assert keys
    for z in keys:
        assert any(lo <= z <= hi for lo, hi in ranges)


def test_clustered_scan_matches_plain_filter(spark, tmp_path):
    df = _points(spark)
    path = str(tmp_path / "clustered")
    write_spatial_clustered(df, path, res=RES, num_files=16)
    got = sorted(r.id for r in scan_spatial(
        spark, path, bbox=BBOX, res=RES).select("id").collect())
    want = sorted(r.id for r in df.filter(
        F.col("lon").between(BBOX[0], BBOX[2])
        & F.col("lat").between(BBOX[1], BBOX[3])).select("id").collect())
    assert got == want and want


def test_zkey_ranges_are_pushed_filters(spark, tmp_path):
    path = str(tmp_path / "clustered")
    write_spatial_clustered(_points(spark, 5_000), path, res=RES,
                            num_files=4)
    df = scan_spatial(spark, path, bbox=BBOX, res=RES)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "_zkey" in plan.split("PushedFilters", 1)[1][:2000]


def test_clustering_prunes_row_groups(spark, tmp_path):
    """The at-scale point: on Z-clustered data only the row groups
    whose _zkey window intersects the query ranges can match; on the
    same data written unclustered, nearly every row group straddles
    the whole key space. Measured from the parquet footers — exactly
    the statistics the pushed BETWEENs prune on."""
    df = _points(spark)
    keyed = df.withColumn("_zkey", morton_key(
        F.col("lon"), F.col("lat"), RES))
    clustered = str(tmp_path / "clustered")
    unclustered = str(tmp_path / "unclustered")
    write_spatial_clustered(df, clustered, res=RES, num_files=16)
    keyed.repartition(16).write.parquet(unclustered)

    ranges = bbox_morton_ranges_py(BBOX, RES)
    c_hit, c_total = matching_row_groups(clustered, ranges)
    u_hit, u_total = matching_row_groups(unclustered, ranges)
    assert u_hit == u_total  # unclustered: no row group can be skipped
    assert c_total >= 8
    # clustered: the large majority of row groups is skippable
    assert c_hit * 3 <= c_total, (c_hit, c_total)


def test_layout_sidecar_default_and_mismatch_guard(spark, tmp_path):
    """The write records its resolution; a scan without res= uses it,
    and a contradicting res= raises instead of silently dropping every
    row (the pushed ranges would not match the persisted keys)."""
    df = _points(spark, 5_000)
    path = str(tmp_path / "clustered")
    write_spatial_clustered(df, path, res=RES, num_files=4)
    assert read_layout_meta(path)["res"] == RES
    got = scan_spatial(spark, path, bbox=BBOX).count()  # sidecar res
    want = df.filter(
        F.col("lon").between(BBOX[0], BBOX[2])
        & F.col("lat").between(BBOX[1], BBOX[3])).count()
    assert got == want and want > 0
    with pytest.raises(ValueError, match="write res"):
        scan_spatial(spark, path, bbox=BBOX, res=RES + 2)
    # explicit-but-equal res passes (back-compat callers)
    assert scan_spatial(spark, path, bbox=BBOX, res=RES).count() == want


def test_clustered_append_layout_mismatch_raises(spark, tmp_path):
    """mode='append' at a different res must raise, not rewrite the
    sidecar: re-labeling would make scan_spatial's pushed ranges miss
    every row keyed at the old res (silent drop, validation passing)."""
    df = _points(spark, 2_000)
    path = str(tmp_path / "appendable")
    write_spatial_clustered(df, path, res=RES, num_files=2)
    with pytest.raises(ValueError, match="append layout"):
        write_spatial_clustered(_points(spark, 500), path, res=RES - 3,
                                num_files=2, mode="append")
    assert read_layout_meta(path)["res"] == RES  # sidecar untouched
    # same-layout append is fine and the scan sees both batches
    write_spatial_clustered(df, path, res=RES, num_files=2, mode="append")
    want = 2 * df.filter(
        F.col("lon").between(BBOX[0], BBOX[2])
        & F.col("lat").between(BBOX[1], BBOX[3])).count()
    assert scan_spatial(spark, path, bbox=BBOX).count() == want


def test_assign_shards_null_order_keys_sort_first(spark):
    """Rows with a NULL order key (e.g. null lon/lat -> null Morton
    key) land deterministically at the FRONT of the order (matching
    the window's nulls-first asc), instead of crashing the bucket
    histogram or silently falling out of the offsets join."""
    from pyrosm_spark.sources.layout import assign_shards

    df = _points(spark, 1_000).withColumn(
        "_zkey",
        F.when(F.col("id") % 400 == 7, F.lit(None)).otherwise(
            morton_key(F.col("lon"), F.col("lat"), RES)))
    got = {r.id: r.shard for r in assign_shards(
        df, 100, "_zkey", "id", n_buckets=16).collect()}
    assert len(got) == 1_000  # no dropped rows
    rows = df.collect()
    order = sorted(((r["_zkey"] is not None, r["_zkey"], r.id)
                    for r in rows))
    want = {i: n // 100 for n, (_, _, i) in enumerate(order)}
    assert got == want
    null_ids = [r.id for r in rows if r["_zkey"] is None]
    assert null_ids and all(got[i] == 0 for i in null_ids)


def test_scan_without_sidecar_requires_res(spark, tmp_path):
    df = _points(spark, 1_000).withColumn(
        "_zkey", morton_key(F.col("lon"), F.col("lat"), RES))
    path = str(tmp_path / "bare")
    df.write.parquet(path)
    with pytest.raises(ValueError, match="sidecar"):
        scan_spatial(spark, path, bbox=BBOX)
    assert scan_spatial(spark, path, bbox=BBOX, res=RES).count() > 0


def test_empty_and_inverted_bbox_scan_is_empty(spark, tmp_path):
    """An inverted bbox matches the plain-filter semantics (empty),
    not a crash."""
    df = _points(spark, 2_000)
    path = str(tmp_path / "clustered")
    write_spatial_clustered(df, path, res=RES, num_files=2)
    assert scan_spatial(spark, path, bbox=(10.0, 10.0, 5.0, 5.0)).count() == 0


def test_assign_shards_matches_global_order(spark):
    """Bucketed two-pass shard assignment == the single-window global
    row_number formulation, with every shard full except the last."""
    from pyrosm_spark.sources.layout import assign_shards

    df = _points(spark, 7_001).withColumn(
        "_zkey", morton_key(F.col("lon"), F.col("lat"), RES))
    got = {r.id: r.shard for r in assign_shards(
        df, 256, "_zkey", "id", n_buckets=32).collect()}
    order = sorted(((r["_zkey"], r.id) for r in df.collect()))
    want = {i: n // 256 for n, (_, i) in enumerate(order)}
    assert got == want
    sizes = {}
    for s in got.values():
        sizes[s] = sizes.get(s, 0) + 1
    last = max(sizes)
    assert set(sizes) == set(range(last + 1))
    assert all(sizes[s] == 256 for s in range(last))
    assert sizes[last] == 7_001 - 256 * last
    # the bucket split actually decomposed the window (not one task)
    mx = max(r["_zkey"] for r in df.collect())
    shift = max(0, int(mx).bit_length() - 32 .bit_length() + 1)
    assert len({int(k) >> shift for k, _ in order}) > 1


def test_assign_shards_invariant_to_bucket_count(spark):
    from pyrosm_spark.sources.layout import assign_shards

    df = _points(spark, 3_000).withColumn(
        "_zkey", morton_key(F.col("lon"), F.col("lat"), RES))
    a = {r.id: r.shard for r in assign_shards(
        df, 100, "_zkey", "id", n_buckets=2).collect()}
    b = {r.id: r.shard for r in assign_shards(
        df, 100, "_zkey", "id", n_buckets=1024).collect()}
    assert a == b
    with pytest.raises(ValueError):
        assign_shards(df, 0, "_zkey", "id")


def test_write_training_shards_roundtrip(spark, tmp_path):
    """Shards materialize as shard=N/ partitions, roundtrip losslessly,
    and are spatially coherent: consecutive shards' key windows only
    meet at the boundary key."""
    import os

    from pyrosm_spark.sources.layout import (
        read_layout_meta,
        write_training_shards,
    )

    df = _points(spark, 4_000).withColumnRenamed("id", "image_id")
    path = str(tmp_path / "shards")
    write_training_shards(df, path, 512, id_col="image_id", res=RES)
    assert read_layout_meta(path)["rows_per_shard"] == 512
    assert os.path.isdir(os.path.join(path, "shard=0"))
    back = spark.read.parquet(path)
    assert back.count() == 4_000
    assert back.select("image_id").distinct().count() == 4_000
    wins = sorted(
        (r.shard, r.lo, r.hi)
        for r in back.groupBy("shard").agg(
            F.min("_zkey").alias("lo"), F.max("_zkey").alias("hi"))
        .collect())
    for (_, _, hi0), (_, lo1, _) in zip(wins, wins[1:]):
        assert hi0 <= lo1


def test_assign_shards_decomposes_regional_corpus(spark):
    """A corpus confined to a small region shares the Morton key's
    high bits; bucketing must split the OCCUPIED span (not raw high
    bits) or the whole corpus lands in one window task — the exact
    single-task sort assign_shards exists to avoid (regression: the
    first implementation collapsed to 1 bucket on the bench table)."""
    from pyrosm_spark.sources.layout import assign_shards

    # ~0.6 x 0.3 degree window (the synth image extent shape)
    df = spark.range(20_000).select(
        F.col("id"),
        (24.6 + (F.col("id") * 2654435761 % 600) / 1000.0).alias("lon"),
        (60.1 + (F.col("id") * 40503 % 300) / 1000.0).alias("lat"),
    ).withColumn("_zkey", morton_key(F.col("lon"), F.col("lat"), 15))
    out = assign_shards(df, 1_000, "_zkey", "id", n_buckets=256,
                        keep_bucket=True)
    n_buckets_used = out.select("_bucket").distinct().count()
    assert n_buckets_used > 16, n_buckets_used
    # and the assignment still equals the global-order formulation
    got = {r.id: r.shard for r in out.collect()}
    order = sorted((r["_zkey"], r.id) for r in df.collect())
    assert got == {i: n // 1_000 for n, (_, i) in enumerate(order)}


def test_cluster_osm_dataset_equal_results_and_pruning(spark, tmp_path):
    """OPTIMIZE for OSM worlds: the clustered dataset serves the exact
    same bbox network as the raw one through the unchanged engine path
    (pushed lon/lat predicates), and the rewritten node table's row
    groups carry tight coordinate windows so most of them are
    skippable for a small bbox."""
    import os

    from pyrosm_spark.api import OSM
    from pyrosm_spark.sources.layout import cluster_osm_dataset
    from pyrosm_spark.synth.osm import TEST_BBOX

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "synth")
    out = str(tmp_path / "optimized")
    done = cluster_osm_dataset(spark, src, out, res=15, num_files=8)
    assert done["osm_nodes"] == "clustered"
    assert done["osm_ways"] == "copied"

    raw = OSM(spark, src, bounding_box=list(TEST_BBOX))
    opt = OSM(spark, out, bounding_box=list(TEST_BBOX))
    a = sorted(map(tuple, raw.get_network("driving")
                   .select("id", "length", "geometry").collect()))
    b = sorted(map(tuple, opt.get_network("driving")
                   .select("id", "length", "geometry").collect()))
    assert a == b and a

    # pruning evidence on the coordinate stats themselves: a SMALL
    # bbox (~1% of the world — TEST_BBOX is deliberately large) leaves
    # most row groups skippable on lon or lat alone (each axis check
    # is an upper bound on what the reader must touch: it reads a
    # group only when BOTH windows intersect)
    m_lon, tot = matching_row_groups(
        os.path.join(out, "osm_nodes.parquet"), [(24.70, 24.76)],
        key_col="lon")
    m_lat, _ = matching_row_groups(
        os.path.join(out, "osm_nodes.parquet"), [(60.15, 60.18)],
        key_col="lat")
    assert tot >= 8
    assert min(m_lon, m_lat) * 2 <= tot, (m_lon, m_lat, tot)
