"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what a cluster deployment would set per
executor: AQE on (runtime coalesce + skew-join), Arrow enabled for the
pandas-UDF geometry/image kernels, shuffle partitions sized to cores
(not the 200 default), UTC session time zone so DuckDB-oracle
comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyrosm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster this function is a no-op passthrough: spark-submit
    owns master/memory and we only set SQL-level confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(master.split("[")[1].rstrip("]*") or 32), 8)
        except (IndexError, ValueError):
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces shuffle partitions by BYTES; geometry/tiling
        # stages are CPU-dense but byte-small (struct-of-double arrays),
        # so the 64 MB default advisory starves cores right after the
        # coordinate join (measured 3-4x on a 475k-way world). 4 MB
        # keeps local parallelism; cluster deployments override.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(4 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
