"""Extract-crop: the reference's PBF-crop SELECTION semantics as a
distributed semi-join cascade.

``pbf_export.pyx:173-248`` selects a consistent element subset for a
bbox in 3 stages: (1) nodes in bbox, (2) ways referencing >=1 selected
node — kept COMPLETE, which pulls in their out-of-box nodes, (3)
relations referencing any selected node or way (J12). The output is
the consistent (nodes, ways, relations) triple, persisted either as
the engine's native parquet interchange (``crop_to_dataset``) or as a
byte-level ``.osm.pbf`` container (``crop_to_pbf``, via the
from-scratch codec in ``sources.pbf`` — the reference's
``pbf_export.pyx:551-638`` capability).

Every stage is a semi-join; the node-closure stage is the union of
in-box nodes and all refs of kept ways (U2/U3 set algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crop_tables(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    bbox: tuple,
    pin: bool = False,
) -> tuple:
    """Consistent bbox crop -> (nodes, ways, relations) subset.

    * ways: >=1 ref in-box (complete-ways, crop stage 2)
    * nodes: in-box ∪ all refs of kept ways (closure, so every kept way
      remains fully resolvable — crop keeps ways complete)
    * relations: >=1 member that is a kept node or kept way (stage 3)

    ``pin=True`` persists the shared id-set intermediates
    (kept_way_ids / closure_node_ids). Callers that run MULTIPLE
    actions over the returned triple (crop_to_dataset writes three
    tables) must pin, or stages 1+2 of the cascade re-execute from the
    raw scans once per action — ~3x crop cost at the 100 TB target.
    The id sets are the small side by construction (bbox-selected);
    MEMORY_AND_DISK, released by the caller via unpersist or left to
    LRU eviction.
    """
    from pyspark import StorageLevel

    xmin, ymin, xmax, ymax = bbox
    in_box_ids = nodes.filter(
        F.col("lon").between(xmin, xmax) & F.col("lat").between(ymin, ymax)
    ).select(F.col("id").alias("nid"))

    refs = ways.select(F.col("id").alias("wid"), F.explode("refs").alias("nid"))
    kept_way_ids = (
        refs.join(in_box_ids, "nid", "left_semi").select("wid").distinct()
    )
    if pin:
        kept_way_ids = kept_way_ids.persist(StorageLevel.MEMORY_AND_DISK)
    kept_ways = ways.join(
        kept_way_ids.withColumnRenamed("wid", "id"), "id", "left_semi")

    closure_node_ids = (
        in_box_ids.unionByName(
            refs.join(kept_way_ids, "wid", "left_semi").select("nid"))
        .distinct()
    )
    if pin:
        closure_node_ids = closure_node_ids.persist(
            StorageLevel.MEMORY_AND_DISK)
    kept_nodes = nodes.join(
        closure_node_ids.withColumnRenamed("nid", "id"), "id", "left_semi")

    members = (
        relations.select(F.col("id").alias("rid"),
                         F.explode("members").alias("m"))
        .select("rid", F.col("m.member_id").alias("member_id"),
                F.col("m.member_type").alias("member_type"))
    )
    rel_by_node = members.filter(F.col("member_type") == "node").join(
        closure_node_ids.select(F.col("nid").alias("member_id")),
        "member_id", "left_semi").select("rid")
    rel_by_way = members.filter(F.col("member_type") == "way").join(
        kept_way_ids.select(F.col("wid").alias("member_id")),
        "member_id", "left_semi").select("rid")
    kept_rel_ids = rel_by_node.unionByName(rel_by_way).distinct()
    kept_relations = relations.join(
        kept_rel_ids.withColumnRenamed("rid", "id"), "id", "left_semi")

    return kept_nodes, kept_ways, kept_relations


def crop_to_dataset(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    bbox: tuple,
    out_dir: str,
) -> dict:
    """The full crop WORKFLOW (reference: ``OSM.crop`` writes a new
    PBF, pbf_export.pyx:551-638): select the consistent subset and
    persist it as this engine's native interchange dataset —
    ``osm_nodes/osm_ways/osm_relations.parquet`` under ``out_dir`` —
    so ``osm_source.load_osm(spark, out_dir)`` reads the crop exactly
    like any other world. Returns per-table row counts (the crop
    manifest). Byte-level PBF output stays out of scope (SURVEY §7.3);
    everything up to the container format is the same operation.
    """
    import os
    from urllib.parse import urlparse

    from pyrosm_spark.sources.table import write_table

    import pyarrow.parquet as pq

    # three write actions share the cascade's id-set intermediates —
    # pinned so stages 1+2 execute once, not once per table
    n, w, r = crop_tables(nodes, ways, relations, bbox, pin=True)
    local = "://" not in out_dir or out_dir.startswith("file:")
    counts = {}
    for name, df in (("osm_nodes", n), ("osm_ways", w),
                     ("osm_relations", r)):
        path = os.path.join(out_dir, f"{name}.parquet")
        write_table(df, path, fmt="parquet")
        if local:
            # manifest counts come from the written footers — counting
            # the DataFrame would re-execute the crop per table
            # file: URIs come in single- (file:/dir) and double-slash
            # (file:///dir) forms — urlparse handles both; a fixed
            # slice would mangle one of them into a 0-count walk
            walk_root = (urlparse(path).path if path.startswith("file:")
                         else path)
            counts[name] = sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _d, fs in os.walk(walk_root)
                for f in fs if f.endswith(".parquet"))
        else:
            # remote filesystem (hdfs:// s3a:// ...): os.walk over the
            # driver's POSIX tree would silently report 0 — read the
            # written footers back through Spark instead (metadata-only
            # count, no crop re-execution)
            counts[name] = nodes.sparkSession.read.parquet(path).count()
    return counts


def crop_to_pbf(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    bbox: tuple,
    out_path: str,
) -> dict:
    """Reference ``OSM.crop``/``pbf_export.pyx:551-638`` end to end:
    the 3-stage selection cascade followed by a byte-level ``.osm.pbf``
    write (distributed block encode, driver-streamed framing). The
    file reads back through ``sources.pbf.read_pbf`` / the ``OSM``
    facade / any public OSM PBF tool. Returns the write manifest
    (per-type row counts + blob count)."""
    from pyrosm_spark.sources.pbf import write_pbf

    n, w, r = crop_tables(nodes, ways, relations, bbox)
    return write_pbf(n, w, r, out_path)
