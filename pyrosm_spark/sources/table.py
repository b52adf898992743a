"""Format-dispatching table reader/writer (parquet now, Iceberg gated).

The reference's storage boundary is a file format it parses itself
(PBF, ``pyrosm/pbfreader.pyx``) plus a GeoParquet result sink
(``pyrosm/engine/geoparquet.py``). Here the boundary is declarative:
``read_table`` returns a DataFrame and lets Catalyst own pushdown /
pruning / split planning for whichever connector backs the location.

Iceberg is the production surface named by the task (catalog tables,
snapshot isolation, hidden partitioning). Its runtime jars are not in
this sandbox, so the Iceberg branch is capability-gated: the probe
checks the Spark session for the ``iceberg`` DataSource and the code
raises a clear error instead of a JVM stack when absent. The parquet
branch exercises the identical call shape, so swapping formats on a
real cluster is a config change, not a code change.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath.

    Probed via DataSource lookup (the same resolution path
    ``spark.read.format("iceberg")`` uses), never by importing
    anything — safe to call in any environment.
    """
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe only
        loader = spark._jsparkSession.sharedState().jarClassLoader()
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "iceberg", spark._jsparkSession.sessionState().conf())
        _ = loader
        return True
    except Exception:
        return False


_EXT_FORMAT = {
    ".parquet": "parquet", ".parq": "parquet", ".orc": "orc",
    ".csv": "csv", ".json": "json", ".avro": "avro",
}


def _infer_format(location: str) -> str:
    """'iceberg' for catalog identifiers (``cat.db.tbl`` — no path
    separator AND not an existing file/dir) or Iceberg table
    directories (a ``metadata/`` folder next to ``data/``); the
    extension's own format for known data-file extensions (an
    ``out.csv`` must dispatch to the csv connector, not the parquet
    reader); 'parquet' otherwise. An existing relative path
    (``images.parquet`` in the cwd) is data, never an identifier —
    this covers the write path too, where the location may not exist
    yet but must still never resolve as a catalog identifier."""
    if os.path.exists(location) and os.path.isdir(
            os.path.join(location, "metadata")):
        return "iceberg"
    low = location.lower()
    for ext, fmt in _EXT_FORMAT.items():
        if low.endswith(ext):
            return fmt
    if os.path.exists(location):
        return "parquet"
    # catalog identifiers are DOTTED (``cat.db.tbl`` / ``db.tbl``): a
    # bare slash-free name like 'results' is a not-yet-existing output
    # directory, not an identifier — routing it to Iceberg would make
    # write_table(df, 'results') fail while './results' succeeds
    if "/" not in location and "\\" not in location and "." in location:
        return "iceberg"
    return "parquet"


def read_table(
    spark: SparkSession,
    location: str,
    fmt: str = "auto",
    snapshot_id: int | None = None,
    as_of_ts_ms: int | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Read a table by path (parquet) or catalog identifier (Iceberg).

    ``snapshot_id`` / ``as_of_ts_ms`` pin an Iceberg snapshot (time
    travel) — the storage-level analogue of the engine's deterministic
    resume keys (plans/checkpoint.py): a re-run against a pinned
    snapshot sees byte-identical input even while the table ingests.
    ``columns`` prunes the scan schema at the source (Catalyst would
    infer it from downstream selects; passing it here documents the
    contract and keeps ad-hoc callers minimal).
    """
    if fmt == "auto":
        fmt = _infer_format(location)
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "iceberg-spark-runtime to spark.jars.packages or pass "
                "fmt='parquet' with a path location."
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_ts_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_ts_ms))
        df = reader.load(location)
    elif fmt == "parquet":
        if snapshot_id is not None or as_of_ts_ms is not None:
            raise ValueError("snapshot pinning requires fmt='iceberg'")
        df = spark.read.parquet(location)
    else:
        df = spark.read.format(fmt).load(location)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_table(
    df: DataFrame,
    location: str,
    fmt: str = "auto",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Write a DataFrame as a table (parquet path or Iceberg ident).

    ``partition_by`` is the physical pruning key: tiling outputs
    partition by cell prefix, OSM outputs by element kind — so
    downstream bbox / layer scans touch only matching directories
    (partition pruning, the parquet analogue of Iceberg's hidden
    partitioning).
    """
    if fmt == "auto":
        fmt = _infer_format(location)
    if fmt == "iceberg":
        if not iceberg_available(df.sparkSession):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "iceberg-spark-runtime to spark.jars.packages or pass "
                "fmt='parquet' with a path location."
            )
        writer = df.writeTo(location)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(
                *[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(location) if fmt == "parquet" else writer.format(
        fmt).save(location)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a BUCKETED parquet table (hash-bucketed
    on ``bucket_cols``, optionally sorted within buckets) — the storage
    layout that removes that side's shuffle from every downstream
    equi-join/aggregation on the bucket key. This is how the node
    table ships on a real cluster: the J1 coordinate join then
    exchanges only the exploded refs side (plan-asserted in
    tests/test_sources.py). Bucketed output requires the session
    catalog (saveAsTable), not a bare path — Spark's bucketing
    metadata lives in the table definition."""
    writer = (df.write.mode(mode)
              .bucketBy(int(n_buckets), *list(bucket_cols)))
    if sort_cols:
        writer = writer.sortBy(*list(sort_cols))
    writer.format("parquet").saveAsTable(name)
