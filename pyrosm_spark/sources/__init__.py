"""Table sources/sinks: the engine's storage boundary.

Every query starts from `read_table` and every materialization goes
through `write_table`; operators never hard-code a format. In this
sandbox the physical format is parquet; on a production cluster the
same call sites bind to Iceberg catalog tables (the north rule's input
surface) — format dispatch, snapshot pinning, and the capability probe
live here so nothing else changes.
"""

from pyrosm_spark.sources.table import (
    iceberg_available,
    read_table,
    write_table,
)
from pyrosm_spark.sources.pbf import (
    read_pbf,
    read_pbf_union,
    write_pbf,
    write_pbf_sharded,
)

__all__ = [
    "read_table", "write_table", "iceberg_available",
    "read_pbf", "read_pbf_union", "write_pbf", "write_pbf_sharded",
]
