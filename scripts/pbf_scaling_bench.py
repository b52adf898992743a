"""PBF-ingest scaling evidence: distributed .osm.pbf decode throughput
at two parallelism levels (N=2 vs 4N=8 worker threads) on identical
input, following the scaling_bench.py protocol (fresh JVM per level,
min over reps).

Input construction (deterministic, no external data): the synthetic
world at grid=128 (~220k elements) is written as a .osm.pbf by the
from-scratch codec with small blocks, then its OSMData blobs are
replicated REPLICAS times into one file — same valid container framing,
~2M elements, enough blobs (hundreds) that both parallelism levels
keep every core busy. The job is `read_pbf_union(path).count()`, which runs
the full distributed decode (wire parse, delta/zigzag, string-table,
tag materialization) in mapInPandas.

Writes/refreshes the "PBF ingest scaling" section of BENCH/BASELINE.md
when run with --update-md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRID = 128
REPLICAS = 10
BLOCK_SIZE = 2000
LEVELS = (2, 8)
REPS = 2
INPUT = os.path.join(REPO, "data", "bench_pbf", "ingest.osm.pbf")


def build_input() -> str:
    if os.path.exists(INPUT):
        return INPUT
    os.makedirs(os.path.dirname(INPUT), exist_ok=True)
    from pyrosm_spark.operators.osm_source import load_osm
    from pyrosm_spark.session import get_spark
    from pyrosm_spark.sources.pbf import iter_blob_index, write_pbf
    from pyrosm_spark.synth import generate_osm_tables

    world = tempfile.mkdtemp(prefix="pbf_scaling_world_")
    generate_osm_tables(world, grid=GRID, seed=42)
    spark = get_spark("pbf_scaling_build", master="local[8]",
                      shuffle_partitions=16)
    base = INPUT + ".base"
    n, w, r = load_osm(spark, world, visible_only=False)
    write_pbf(n, w, r, base, block_size=BLOCK_SIZE)
    spark.stop()

    with open(base, "rb") as f:
        data = f.read()
    spans = []
    header_end = None
    for typ, off, ln in iter_blob_index(base):
        # offset points at the Blob payload; the frame starts at the
        # 4-byte length prefix before the BlobHeader. Recover frame
        # bounds from consecutive payload ends.
        spans.append((typ, off, ln))
    # frame bytes: from end of previous blob payload to end of this one
    frames = []
    prev_end = 0
    for typ, off, ln in spans:
        frames.append((typ, data[prev_end:off + ln]))
        prev_end = off + ln
    tmp = INPUT + ".inprogress"
    with open(tmp, "wb") as f:
        for typ, fb in frames:
            if typ == "OSMHeader":
                f.write(fb)
        for _ in range(REPLICAS):
            for typ, fb in frames:
                if typ == "OSMData":
                    f.write(fb)
    os.replace(tmp, INPUT)
    os.remove(base)
    return INPUT


_RUN_SNIPPET = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyrosm_spark.session import get_spark
from pyrosm_spark.sources.pbf import read_pbf_union
spark = get_spark("pbf_scaling", master="local[{cpus}]",
                  shuffle_partitions={cpus})
u = read_pbf_union(spark, {path!r})
u.count()  # warm the JVM + python workers
t0 = time.time()
n = read_pbf_union(spark, {path!r}).count()
el = time.time() - t0
print(json.dumps({{"elements": n, "sec": el, "eps": n / el}}))
spark.stop()
"""


def run_level(cpus: int, path: str) -> dict:
    best = None
    for _ in range(REPS):
        out = subprocess.run(
            [sys.executable, "-c",
             _RUN_SNIPPET.format(repo=REPO, cpus=cpus, path=path)],
            capture_output=True, text=True, timeout=1800)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(out.stderr[-2000:])
        r = json.loads(lines[-1])
        if best is None or r["eps"] > best["eps"]:
            best = r
    return best


def main():
    path = build_input()
    size_mb = os.path.getsize(path) / 1e6
    results = {}
    for cpus in LEVELS:
        results[cpus] = run_level(cpus, path)
        print(f"local[{cpus}]: {results[cpus]['elements']:,} elements "
              f"in {results[cpus]['sec']:.1f}s = "
              f"{results[cpus]['eps']:,.0f} elem/s")
    lo, hi = LEVELS
    eff = (results[hi]["eps"] / results[lo]["eps"]) / (hi / lo)
    print(f"scaling efficiency {lo}->{hi}: {eff:.2f}")
    report = {
        "input_mb": round(size_mb, 1),
        "elements": results[lo]["elements"],
        "levels": {str(c): results[c] for c in LEVELS},
        "efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    if "--update-md" in sys.argv:
        update_md(report)
    return report


def update_md(report: dict):
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md) as f:
        content = f.read()
    marker = "## PBF ingest scaling"
    lo, hi = LEVELS
    rl, rh = report["levels"][str(lo)], report["levels"][str(hi)]
    section = f"""{marker}

Distributed `.osm.pbf` decode (`sources/pbf.py read_pbf_union`, the
from-scratch codec) on a {report['input_mb']} MB synthetic file of
{report['elements']:,} elements (~{report['elements'] // 220_000}x
replicated grid-128 world, {BLOCK_SIZE}-element blocks); fresh JVM per
level, best of {REPS}, warm-up pass excluded.

| parallelism | elements/sec | wall (s) |
|---|---|---|
| local[{lo}] | {rl['eps']:,.0f} | {rl['sec']:.1f} |
| local[{hi}] | {rh['eps']:,.0f} | {rh['sec']:.1f} |

**Ingest scaling efficiency {lo}->{hi}: {report['efficiency']:.2f}**
(single-core kernel throughput ~86k elem/s already exceeds the
reference's 46-76k features/s Cython parse ceiling, BASELINE.md).
"""
    if marker in content:
        head, _sep, tail = content.partition(marker)
        rest = tail.split("\n## ", 1)
        content = head + section + ("\n## " + rest[1] if len(rest) > 1
                                    else "")
    else:
        content = content.rstrip() + "\n\n" + section
    with open(md, "w") as f:
        f.write(content)
    print(f"updated {md}")


if __name__ == "__main__":
    main()
