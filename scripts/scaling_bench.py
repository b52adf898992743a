"""Two-parallelism scaling evidence (north rule: efficiency >= 0.8 from
N to 4N executors, evidenced at local[8] vs local[32] on identical
input — per the driver instruction).

Runs bench.py in a subprocess at each parallelism (fresh JVM per level,
same input), parses the JSON line, computes scaling efficiency =
(throughput_4N / throughput_N) / 4, and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"bench.py produced no JSON at {cpus} cpus:\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(line[-1])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    low, high = 8, 32
    r_low = run_bench(low, sf_dir)
    r_high = run_bench(high, sf_dir)

    thr_low, thr_high = r_low["value"], r_high["value"]
    speedup = thr_high / thr_low
    eff = speedup / (high / low)

    # suite-level (all queries, not just the headline spatial pipeline)
    suite_low = r_low["total_sec"]
    suite_high = r_high["total_sec"]
    suite_speedup = suite_low / suite_high
    suite_eff = suite_speedup / (high / low)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Input: identical bench tables at sf={r_low['sf']} "
        f"({r_low['n_images']} image rows, {r_low['n_polygons']} polygons); "
        f"same machine, fresh JVM per level.",
        "",
        "| parallelism | headline rows/sec | suite wall (s) |",
        "|---|---|---|",
        f"| local[{low}] | {thr_low:,.0f} | {suite_low:.1f} |",
        f"| local[{high}] | {thr_high:,.0f} | {suite_high:.1f} |",
        "",
        f"**Headline (spatial join + tile assignment) speedup {low}->{high}:"
        f" {speedup:.2f}x -> scaling efficiency {eff:.2f}** "
        f"(target >= 0.8; reference pyrosm measured 0.27 at 10 workers, "
        "BASELINE.md).",
        "",
        f"Suite-level speedup: {suite_speedup:.2f}x -> efficiency "
        f"{suite_eff:.2f}.",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in r_low["queries"]:
        lines.append(f"| {q} | {r_low['queries'][q]:.2f} "
                     f"| {r_high['queries'][q]:.2f} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r_low),
        json.dumps(r_high),
        "```",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"eff_headline": round(eff, 3),
                      "eff_suite": round(suite_eff, 3),
                      "thr_low": thr_low, "thr_high": thr_high,
                      "report": path}))


if __name__ == "__main__":
    main()
