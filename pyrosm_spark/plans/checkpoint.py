"""Checkpoint + lineage manifests: resumable multi-stage jobs.

Generalizes the reference's result cache (``engine/cache.py:46-166``:
deterministic key over (source identity, query params), atomic
tmp->rename materialization, empty-result markers) to a multi-stage
distributed pipeline, adding what the north rule demands: per-partition
lineage with row-count/byte metrics, so a resumed job can (a) skip
completed stages entirely and (b) audit exactly what each stage
produced.

Stage key = sha256(stage name, canonical params JSON, input
fingerprints). Input fingerprints are (path, mtime_ns, size) of source
files — the same cache-invalidates-on-source-change rule as
``cache.py:46-63``. A stage directory is valid iff its ``manifest.json``
exists, carries the matching key, and every listed part file still has
the recorded size.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"  # leading underscore: ignored by Spark readers


def default_cache_root() -> str:
    """The engine's default checkpoint/cache directory — the analogue
    of the reference's ``<tempdir>/pyrosm/cache`` (engine/cache.py:20).
    Overridable via ``PYROSM_SPARK_CACHE_DIR``."""
    import tempfile

    return os.environ.get(
        "PYROSM_SPARK_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "pyrosm_spark", "cache"))


def list_cache_files(root: str | None = None) -> list:
    """Stage directories currently materialized under ``root``
    (reference ``cache.list_files``, engine/cache.py): every directory
    holding a valid manifest, sorted."""
    root = root or default_cache_root()
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, MANIFEST)):
            out.append(d)
    return out


def clear_cache(root: str | None = None) -> int:
    """Remove materialized stage directories (reference
    ``cache.clear``). Returns the number of stage dirs removed."""
    dirs = list_cache_files(root)
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    return len(dirs)


def file_fingerprint(path: str) -> dict:
    """Source-identity fingerprint (cache.py:46-63 key components)."""
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(path) for f in fs
            if not f.startswith(("_", "."))
        )
        h = hashlib.sha256()
        total = 0
        for p in parts:
            st = os.stat(p)
            h.update(f"{p}:{st.st_mtime_ns}:{st.st_size}".encode())
            total += st.st_size
        return {"path": path, "kind": "dir", "hash": h.hexdigest()[:16],
                "bytes": total}
    st = os.stat(path)
    return {"path": path, "kind": "file", "mtime_ns": st.st_mtime_ns,
            "bytes": st.st_size}


def stage_key(name: str, params: dict, inputs: list) -> str:
    blob = json.dumps(
        {"name": name, "params": params, "inputs": inputs},
        sort_keys=True, default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:20]


def _partition_lineage(out_dir: str) -> list:
    """Per-part-file lineage: rows + bytes via parquet footers."""
    import pyarrow.parquet as pq

    entries = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(out_dir, f)
        meta = pq.ParquetFile(p).metadata
        entries.append({
            "file": f,
            "rows": meta.num_rows,
            "bytes": os.path.getsize(p),
            "row_groups": meta.num_row_groups,
        })
    return entries


class CheckpointManager:
    """Deterministic stage materialization with skip-on-resume.

    >>> cp = CheckpointManager(spark, "/ckpt/jobX")
    >>> edges = cp.stage("network_edges", {"type": "driving"},
    ...                  inputs=["/data/osm"], fn=lambda: build_edges(...))

    Re-running the same pipeline re-executes nothing whose key still
    matches; changing params or any input fingerprint invalidates only
    the affected stages.
    """

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root or default_cache_root()
        root = self.root
        os.makedirs(root, exist_ok=True)
        self.executed: list = []   # stage names actually run this session
        self.skipped: list = []    # stages resumed from checkpoint

    def _dir(self, name: str, key: str) -> str:
        return os.path.join(self.root, f"{name}-{key}")

    def _valid(self, out_dir: str, key: str) -> bool:
        mpath = os.path.join(out_dir, MANIFEST)
        if not os.path.exists(mpath):
            return False
        try:
            m = json.load(open(mpath))
        except (json.JSONDecodeError, OSError):
            return False
        if m.get("key") != key:
            return False
        for e in m.get("partitions", []):
            p = os.path.join(out_dir, e["file"])
            if not os.path.exists(p) or os.path.getsize(p) != e["bytes"]:
                return False
        return True

    def stage(
        self,
        name: str,
        params: dict,
        inputs: list,
        fn: Callable[[], DataFrame],
        partitions: int | None = None,
    ) -> DataFrame:
        fps = [file_fingerprint(p) for p in inputs]
        key = stage_key(name, params, fps)
        out_dir = self._dir(name, key)

        if self._valid(out_dir, key):
            self.skipped.append(name)
            return self.spark.read.parquet(out_dir)

        # build under a PER-ATTEMPT tmp (pid+uuid) so two concurrent
        # builders of the same key never write into each other's
        # staging dir — both publish identical content (the key pins
        # inputs+params). Stale/partial dirs are cleared at PUBLISH
        # time behind a fresh _valid() check: clearing here would race
        # a concurrent builder that publishes a valid result between
        # our _valid()=False above and the rmtree, deleting its output
        # under an already-returned DataFrame.
        tmp = f"{out_dir}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"

        t0 = time.time()
        df = fn()
        if partitions:
            df = df.repartition(partitions)
        df.write.mode("overwrite").parquet(tmp)
        lineage = _partition_lineage(tmp)
        manifest = {
            "key": key,
            "stage": name,
            "params": params,
            "inputs": fps,
            "partitions": lineage,
            "total_rows": sum(e["rows"] for e in lineage),
            "total_bytes": sum(e["bytes"] for e in lineage),
            "wall_sec": round(time.time() - t0, 3),
            "written_at_unix": int(time.time()),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        try:
            os.rename(tmp, out_dir)  # atomic publish (cache.py:121-141)
        except OSError:
            if self._valid(out_dir, key):
                # another attempt published first; both carry the same
                # key, so its content is ours — drop our copy
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # stale/partial residue from a dead run blocks the
                # rename — clear it (re-validated just above) and retry
                shutil.rmtree(out_dir, ignore_errors=True)
                try:
                    os.rename(tmp, out_dir)
                except OSError:
                    shutil.rmtree(tmp, ignore_errors=True)
                    if not self._valid(out_dir, key):
                        raise
        self.executed.append(name)
        return self.spark.read.parquet(out_dir)

    def manifest(self, name: str, params: dict, inputs: list) -> dict | None:
        fps = [file_fingerprint(p) for p in inputs]
        key = stage_key(name, params, fps)
        mpath = os.path.join(self._dir(name, key), MANIFEST)
        if not os.path.exists(mpath):
            return None
        return json.load(open(mpath))
