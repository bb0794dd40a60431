"""Summarize an ab_snapshot.py JSONL log: per-(mode,cpus) minima + efficiency.

The A/B harness prints one JSON line per (round, mode, cpus) leg; this tool
merges minima across every leg in the log (so a resumed A/B — e.g. after a
session restart — still folds all rounds) and prints the comparison table
that goes into BENCH_APPENDIX.md.

Usage: python tools/ab_report.py /tmp/ab_snapshot_600k.log [low] [high]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    factor = high / low

    mins: dict[tuple[str, int], dict[str, float]] = {}
    legs: dict[tuple[str, int], int] = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        key = (r["mode"], r["cpus"])
        legs[key] = legs.get(key, 0) + 1
        cur = mins.setdefault(key, {})
        for q, t in r["queries"].items():
            cur[q] = min(cur.get(q, float("inf")), t)

    modes = sorted({m for m, _ in mins})
    print("legs per (mode,cpus):",
          {f"{m}@{c}": n for (m, c), n in sorted(legs.items())})
    qnames = list(next(iter(mins.values())))
    header = ("| query | "
              + " | ".join(f"{m}@{c}" for m in modes for c in (low, high))
              + " | " + " | ".join(f"{m} eff" for m in modes)
              + " | winner@{h} |".format(h=high))
    print(header)
    print("|---" * (1 + 3 * len(modes)) + "|")
    totals = {(m, c): 0.0 for m in modes for c in (low, high)}
    for q in qnames:
        cells = []
        for m in modes:
            for c in (low, high):
                t = mins[(m, c)].get(q, float("nan"))
                totals[(m, c)] += t
                cells.append(f"{t:.2f}")
        effs = [(mins[(m, low)][q] / mins[(m, high)][q]) / factor
                for m in modes]
        win = min(modes, key=lambda m: mins[(m, high)][q])
        print(f"| {q} | " + " | ".join(cells) + " | "
              + " | ".join(f"{e:.2f}" for e in effs) + f" | {win} |")
    print("| TOTAL | "
          + " | ".join(f"{totals[(m, c)]:.2f}"
                       for m in modes for c in (low, high))
          + " | "
          + " | ".join(
              f"{(totals[(m, low)] / totals[(m, high)]) / factor:.2f}"
              for m in modes)
          + f" | {min(modes, key=lambda m: totals[(m, high)])} |")


if __name__ == "__main__":
    main()
