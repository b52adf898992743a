"""Checkpoint/lineage/resume semantics."""

import json
import os

from pyspark.sql import functions as F

from pyrosm_spark.plans.checkpoint import CheckpointManager


def test_stage_runs_then_resumes(spark, synth_dir, tmp_path):
    root = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return (
            spark.read.parquet(os.path.join(synth_dir, "images.parquet"))
            .groupBy("fmt").count()
        )

    cp = CheckpointManager(spark, root)
    params = {"res": 15}
    inputs = [os.path.join(synth_dir, "images.parquet")]
    df1 = cp.stage("fmt_counts", params, inputs, build)
    assert calls["n"] == 1 and cp.executed == ["fmt_counts"]
    rows1 = {r["fmt"]: r["count"] for r in df1.collect()}

    cp2 = CheckpointManager(spark, root)
    df2 = cp2.stage("fmt_counts", params, inputs, build)
    assert calls["n"] == 1  # resumed, not re-run
    assert cp2.skipped == ["fmt_counts"]
    assert {r["fmt"]: r["count"] for r in df2.collect()} == rows1

    # manifest carries per-partition lineage with true row totals
    m = cp2.manifest("fmt_counts", params, inputs)
    assert m["total_rows"] == len(rows1)
    assert m["total_bytes"] > 0
    assert all({"file", "rows", "bytes"} <= set(e) for e in m["partitions"])


def test_param_change_invalidates(spark, synth_dir, tmp_path):
    root = str(tmp_path / "ckpt2")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumn("x", F.col("id") * 2)

    cp = CheckpointManager(spark, root)
    inputs = [os.path.join(synth_dir, "images.parquet")]
    cp.stage("s", {"k": 1}, inputs, build)
    cp.stage("s", {"k": 1}, inputs, build)
    assert calls["n"] == 1
    cp.stage("s", {"k": 2}, inputs, build)  # param change -> re-run
    assert calls["n"] == 2


def test_corrupt_part_triggers_rerun(spark, synth_dir, tmp_path):
    root = str(tmp_path / "ckpt3")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100)

    cp = CheckpointManager(spark, root)
    inputs = [os.path.join(synth_dir, "images.parquet")]
    df = cp.stage("s", {}, inputs, build)
    df.count()
    # truncate one part file
    stage_dir = [d for d in os.listdir(root) if d.startswith("s-")][0]
    parts = [f for f in os.listdir(os.path.join(root, stage_dir))
             if f.endswith(".parquet")]
    victim = os.path.join(root, stage_dir, parts[0])
    with open(victim, "wb") as f:
        f.write(b"corrupt")
    cp2 = CheckpointManager(spark, root)
    df2 = cp2.stage("s", {}, inputs, build)
    assert calls["n"] == 2  # size mismatch detected -> stage re-ran
    assert df2.count() == 100
    # manifest json is valid after re-publish
    m = json.load(open(os.path.join(root, stage_dir, "_manifest.json")))
    assert m["total_rows"] == 100
