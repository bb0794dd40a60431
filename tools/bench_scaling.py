"""Two-parallelism scaling evidence (BASELINE.json north rule).

No real multi-node cluster exists in this sandbox, so the agreed proxy
(BASELINE.md) is the same job at two local parallelism levels on identical
input: local[N] vs local[4N]. Each level runs bench.py in a fresh JVM
(subprocess) so the master setting is honest.

Efficiency for a fixed-size workload scaled from N to 4N cores is
(T_N / T_4N) / 4 — 1.0 means perfect strong scaling. Writes BENCH.md.

Usage: python tools/bench_scaling.py [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True,
        text=True, timeout=3600, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main():
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    factor = high / low
    r_low = run(low)
    r_high = run(high)

    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Same job, same input (sf={r_low['sf']}), fresh JVM per level:",
        f"`local[{low}]` vs `local[{high}]` — the sandbox proxy for N vs 4N",
        "executors agreed in BASELINE.md (no real cluster here).",
        "",
        f"| query | local[{low}] sec | local[{high}] sec | speedup | "
        f"efficiency (/{factor:.0f}x) |",
        "|---|---|---|---|---|",
    ]
    for q in r_low["queries"]:
        tl, th = r_low["queries"][q], r_high["queries"][q]
        sp = tl / th if th else float("nan")
        lines.append(
            f"| {q} | {tl:.2f} | {th:.2f} | {sp:.2f}x | {sp / factor:.2f} |")
    tot_l, tot_h = r_low["value"], r_high["value"]
    eff = (tot_l / tot_h) / factor
    lines += [
        f"| **total** | **{tot_l:.2f}** | **{tot_h:.2f}** | "
        f"**{tot_l / tot_h:.2f}x** | **{eff:.2f}** |",
        "",
        "## Throughput",
        "",
        f"| metric | local[{low}] | local[{high}] |",
        "|---|---|---|",
        f"| containment areas/sec | {r_low['extra']['containment_areas_per_sec']} "
        f"| {r_high['extra']['containment_areas_per_sec']} |",
        f"| geocode lookups/sec | {r_low['extra']['geocode_lookups_per_sec']} "
        f"| {r_high['extra']['geocode_lookups_per_sec']} |",
        "",
        "Notes: local-mode strong scaling on a fixed-size problem undercounts",
        "cluster weak-scaling efficiency — per-task fixed overheads (job",
        "scheduling, Python worker startup, Arrow batch setup) do not shrink",
        "with more cores, and several suite members are already",
        "sub-second-per-stage at this sf. The heavy scan/join/UDF stages are",
        "the ones that matter at 100 TB; their per-row work is embarrassingly",
        "partition-parallel (cell-salted joins, no driver-side loops).",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r_low),
        json.dumps(r_high),
        "```",
    ]
    with open("BENCH.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"low": r_low["value"], "high": r_high["value"],
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
