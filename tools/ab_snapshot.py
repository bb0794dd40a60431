"""Interleaved A/B: disk-parquet stage barriers vs localCheckpoint.

VERDICT r4 task 1: the measured anti-scaling term in the round-4 pipeline
decomposition was localCheckpoint snapshot serialization into the ONE
shared local-mode block manager (3.76 s at local[4] -> 6.84 s at local[16],
0.55x). plans/snapshots.py has the alternative — write/read a temp parquet
directory, per-partition parallel file I/O, the Iceberg-snapshot analog —
switchable per-process via SPARK_GRAFT_BARRIER. This tool runs bench.py
under BOTH modes at BOTH parallelism levels, interleaved
(P@low, P@high, C@low, C@high, repeat) so a host-noise burst cannot land on
one mode only, and reports per-query minima per (mode, cpus) plus each
mode's strong-scaling efficiency.

Results -> BENCH_APPENDIX.md (round-5 section). Does NOT write
BENCH_HISTORY.jsonl — the winning mode becomes snapshots.DEFAULT_MODE and
the standard grind (tools/bench_scaling.py) then regenerates the durable
evidence under it.

Usage: python tools/ab_snapshot.py [low_cpus] [high_cpus] [n_areas]
       [rounds] [bench_rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

MODES = ("parquet", "checkpoint")
FOCUS = ("pipeline_areas", "cell_index", "containment_graph",
         "geocode_batch", "minhash_scaled")


def run(mode: str, cpus: int, n_areas: int, bench_rounds: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_BARRIER=mode,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_AREAS=str(n_areas),
               SPARK_GRAFT_BENCH_POINTS=str(n_areas),
               SPARK_GRAFT_BENCH_DOCS=str(n_areas),
               SPARK_GRAFT_BENCH_ROUNDS=str(bench_rounds),
               SPARK_GRAFT_BENCH_REPS="1")
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True,
        text=True, timeout=5400, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_areas = int(sys.argv[3]) if len(sys.argv) > 3 else 600_000
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    bench_rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    factor = high / low

    mins: dict[tuple[str, int], dict[str, float]] = {}
    for rnd in range(rounds):
        for mode in MODES:
            for cpus in (low, high):
                r = run(mode, cpus, n_areas, bench_rounds)
                key = (mode, cpus)
                cur = mins.setdefault(key, {})
                for q, t in r["queries"].items():
                    cur[q] = min(cur.get(q, float("inf")), t)
                print(json.dumps({"round": rnd, "mode": mode, "cpus": cpus,
                                  "queries": r["queries"]}), flush=True)

    qnames = list(mins[(MODES[0], low)])
    print(f"\n| query | " + " | ".join(
        f"{m}@{c}" for m in MODES for c in (low, high))
        + f" | {MODES[0]} eff | {MODES[1]} eff |")
    print("|---" * (2 + 2 * len(MODES)) + "|")
    for q in qnames:
        cells = [f"{mins[(m, c)][q]:.2f}"
                 for m in MODES for c in (low, high)]
        effs = [(mins[(m, low)][q] / mins[(m, high)][q]) / factor
                for m in MODES]
        star = " *" if q in FOCUS else ""
        print(f"| {q}{star} | " + " | ".join(cells)
              + f" | {effs[0]:.2f} | {effs[1]:.2f} |")
    for m in MODES:
        cl = sum(mins[(m, low)][q] for q in FOCUS)
        ch = sum(mins[(m, high)][q] for q in FOCUS)
        print(f"{m}: barrier-heavy total {cl:.2f} -> {ch:.2f} s, "
              f"eff {(cl / ch) / factor:.2f}")


if __name__ == "__main__":
    main()
