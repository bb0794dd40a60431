"""Two-parallelism scaling evidence (BASELINE.json north rule).

No real multi-node cluster exists in this sandbox, so the agreed proxy
(BASELINE.md) is the same job at two local parallelism levels on identical
input: local[N] vs local[4N]. Each level runs bench.py in a fresh JVM
(subprocess) so the master setting is honest.

The scaling run uses a compute-bound configuration (default 200k areas /
200k geocode points — 10x the per-round default) so per-stage fixed
overheads (job scheduling, Python worker pool startup, Arrow batch setup)
don't drown the partition-parallel work the efficiency claim is about, and
SPARK_GRAFT_BENCH_REPS=2 with min-per-query to suppress the sandbox host's
steal-time noise.

Efficiency for a fixed-size workload scaled from N to 4N cores is
(T_N / T_4N) / 4 — 1.0 means perfect strong scaling. Writes BENCH.md.

Usage: python tools/bench_scaling.py [low_cpus] [high_cpus] [n_areas] [reps]
       [rounds]   (rounds=0: report-only — regenerate BENCH.md from
                   BENCH_HISTORY.jsonl entries at the current git SHA
                   without launching any new runs)
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import subprocess
import sys


def engine_fingerprint() -> str:
    """Hash of every file whose code can affect a timing (the engine
    package + bench harness + driver entry). Minima are merged only
    across history entries with the SAME fingerprint, so doc/tooling
    commits don't orphan prior evidence but any engine change does
    (ADVICE r1, tightened from git-SHA keying)."""
    h = hashlib.sha256()
    files = sorted(glob.glob("osm_jigsaw_spark/**/*.py", recursive=True))
    files += ["bench.py", "__spark_entry__.py"]
    for p in files:
        h.update(p.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def run(cpus: int, n_areas: int, reps: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_AREAS=str(n_areas),
               SPARK_GRAFT_BENCH_POINTS=str(n_areas),
               SPARK_GRAFT_BENCH_REPS=str(reps))
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True,
        text=True, timeout=5400, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


CORE = ("pipeline_areas", "cell_index", "containment_graph",
        "geocode_batch", "tile_assignments", "minhash_scaled",
        "cosine_scaled")


def main():
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_areas = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    factor = high / low

    # Alternate levels L,H,L,H…: the host's steal-time noise arrives in
    # multi-minute bursts, so back-to-back single runs can land one level
    # entirely inside a noisy window and flip the comparison. Per-query
    # minima across rounds estimate each level's clean-window performance.
    # Every run is also appended to BENCH_HISTORY.jsonl tagged with the
    # current git SHA, and minima are merged ONLY across sessions at the
    # same (sha, cpus, n_areas) — timings from older engine code are never
    # folded into the current code's evidence (ADVICE r1).
    hist_path = "BENCH_HISTORY.jsonl"
    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True).stdout.strip() or "unknown"
    fp = engine_fingerprint()

    def record(r: dict, cpus: int) -> None:
        with open(hist_path, "a") as f:
            f.write(json.dumps({"sha": sha, "fp": fp, "cpus": cpus,
                                "series": "core", "n_areas": n_areas,
                                "sf": r.get("sf", 0.1),
                                "queries": r["queries"],
                                "extra": r["extra"]}) + "\n")

    # snapshot prior-session history BEFORE running (this session's own
    # record() appends would otherwise be folded in twice)
    prior: list[dict] = []
    if os.path.exists(hist_path):
        for line in open(hist_path):
            h = json.loads(line)
            # only this tool's own series: explicit tag on new rows; legacy
            # untagged rows qualify only if they carry core-suite queries
            # (bench_geocode's heavy rows don't, by construction)
            if h.get("series", "core") != "core":
                continue
            if not any(q in h.get("queries", {}) for q in CORE):
                continue
            if h["n_areas"] != n_areas:
                continue
            # strict fingerprint match for rows that carry one (rows
            # recorded at this commit but with uncommitted engine edits
            # have a different fp and must not fold in); the git-SHA
            # fallback applies only to legacy rows lacking fp (ADVICE r3)
            if "fp" in h:
                if h["fp"] != fp:
                    continue
            elif h.get("sha") != sha:
                continue
            prior.append(h)

    runs_low, runs_high = [], []
    for _ in range(rounds):
        r = run(low, n_areas, reps)
        record(r, low)
        runs_low.append(r)
        r = run(high, n_areas, reps)
        record(r, high)
        runs_high.append(r)

    # fold in prior sessions at the same configuration AND engine version
    for h in prior:
        entry = {"queries": h["queries"], "extra": h["extra"],
                 "value": 0, "sf": h.get("sf", 0.1)}
        if h["cpus"] == low:
            runs_low.append(entry)
        elif h["cpus"] == high:
            runs_high.append(entry)
    if not runs_low or not runs_high:
        sys.exit(f"no history at sha={sha} n_areas={n_areas} for both "
                 f"cpus={low} and cpus={high}; run with rounds>0 first")

    def merged(rs: list[dict]) -> dict:
        out = json.loads(json.dumps(rs[0]))
        for r in rs[1:]:
            for q in out["queries"]:
                t = r["queries"].get(q)  # older sessions may lack a query
                if t is not None and t < out["queries"][q]:
                    out["queries"][q] = t
        out["value"] = round(sum(out["queries"].values()), 3)
        na = out["extra"]["n_areas"]
        out["extra"]["containment_areas_per_sec"] = round(
            na / out["queries"]["containment_graph"], 1)
        npts = n_areas
        out["extra"]["geocode_lookups_per_sec"] = round(
            npts / out["queries"]["geocode_batch"], 1)
        return out

    r_low = merged(runs_low)
    r_high = merged(runs_high)

    # per-round end-to-end core totals (this session's fresh runs only) —
    # the merged-minima core total below is a composite no single run
    # achieved; these show what single runs actually did (ADVICE r1)
    def round_totals(rs: list[dict]) -> list[float]:
        take = rs[:rounds] if rounds else rs  # report-only: all history
        return sorted(
            round(sum(t for q, t in r["queries"].items() if q in CORE), 2)
            for r in take)

    tot_low, tot_high = round_totals(runs_low), round_totals(runs_high)

    def med(xs: list[float]) -> float:
        return xs[len(xs) // 2] if len(xs) % 2 else (
            xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2

    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Same job, same input ({n_areas:,} areas / {n_areas:,} geocode",
        f"points / sf={r_low['sf']} testdata), fresh JVM per level:",
        f"`local[{low}]` vs `local[{high}]` — the sandbox proxy for N vs 4N",
        "executors agreed in BASELINE.md (no real cluster here). Timing is",
        f"the per-query min over {len(runs_low)}/{len(runs_high)} fresh-JVM "
        f"rounds (low/high level)",
        f"× {reps} in-JVM warm reps each (cache cleared between reps) — the",
        "host is time-shared and steal-time arrives in multi-minute bursts,",
        "so minima estimate clean-window performance at each level.",
        "",
        f"| query | local[{low}] sec | local[{high}] sec | speedup | "
        f"efficiency (/{factor:.0f}x) | fixed cost sec (2-pt fit, % of "
        f"local[{high}]) |",
        "|---|---|---|---|---|---|",
    ]
    core_low = core_high = 0.0
    for q in r_low["queries"]:
        tl, th = r_low["queries"][q], r_high["queries"][q]
        if q in CORE:
            core_low += tl
            core_high += th
        sp = tl / th if th else float("nan")
        # two-point Amdahl fit T(c) = F + W/c: attributes each query's
        # efficiency loss to its non-parallel floor (plan compile, Python
        # worker spin-up, driver-side stages) vs scalable task time
        W = (tl - th) / (1.0 / low - 1.0 / high)
        Fq = max(0.0, tl - W / low)
        fpct = (Fq / th * 100) if th else float("nan")
        lines.append(
            f"| {q} | {tl:.2f} | {th:.2f} | {sp:.2f}x | {sp / factor:.2f} "
            f"| {Fq:.2f} ({fpct:.0f}%) |")
    eff = (core_low / core_high) / factor
    lines += [
        f"| **core total** | **{core_low:.2f}** | **{core_high:.2f}** | "
        f"**{core_low / core_high:.2f}x** | **{eff:.2f}** | |",
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
    ]

    # scale sweep: the north rule's efficiency claim must hold as the
    # problem grows, not at one size. For every problem size with rounds
    # at BOTH levels at the current fingerprint, report the merged-minima
    # core efficiency and the key per-query efficiencies side by side.
    by_size: dict[int, dict[int, list[dict]]] = {}
    if os.path.exists(hist_path):
        for line in open(hist_path):
            h = json.loads(line)
            if h.get("series", "core") != "core":
                continue
            if h.get("fp") != fp:
                continue
            if h["cpus"] not in (low, high):
                continue
            by_size.setdefault(h["n_areas"], {}).setdefault(
                h["cpus"], []).append(
                {"queries": h["queries"], "extra": h["extra"],
                 "value": 0, "sf": h.get("sf", 0.1)})
    sweep_sizes = sorted(s for s, lv in by_size.items()
                         if low in lv and high in lv)
    if len(sweep_sizes) > 1:
        lines += [
            "## Scale sweep — efficiency as the problem grows",
            "",
            "Merged-minima core efficiency at every problem size measured",
            f"at this fingerprint (local[{low}] vs local[{high}], same",
            "methodology as above). Strong-scaling efficiency should hold",
            "or improve as per-partition work grows relative to fixed",
            "costs — this is the two-size evidence for the north rule's",
            "claim that the plan survives growth in parallel work:",
            "",
            f"| areas | rounds L/H | core eff | containment eff | geocode "
            f"eff | pipeline eff | minhash eff | areas/sec @{high} | "
            f"lookups/sec @{high} |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for size in sweep_sizes:
            ml = merged(by_size[size][low])
            mh = merged(by_size[size][high])
            cl = sum(t for q, t in ml["queries"].items() if q in CORE)
            ch = sum(t for q, t in mh["queries"].items() if q in CORE)

            def qeff(q: str) -> float:
                return (ml["queries"][q] / mh["queries"][q]) / factor

            # throughputs recomputed at this row's size (merged() divides
            # by the outer run's n_areas; redo with the row's own)
            aps = round(size / mh["queries"]["containment_graph"], 1)
            lps = round(size / mh["queries"]["geocode_batch"], 1)
            lines.append(
                f"| {size:,} | {len(by_size[size][low])}/"
                f"{len(by_size[size][high])} | {(cl / ch) / factor:.2f} "
                f"| {qeff('containment_graph'):.2f} "
                f"| {qeff('geocode_batch'):.2f} "
                f"| {qeff('pipeline_areas'):.2f} "
                f"| {qeff('minhash_scaled'):.2f} | {aps} | {lps} |")
        lines.append("")
    lines += [
        ("## Per-round end-to-end core totals (this session, no minima "
         "merge)" if rounds else
         "## Per-round end-to-end core totals (all rounds at this engine "
         "fingerprint, no minima merge)"),
        "",
        f"| level | rounds (sec, sorted) | median | min |",
        "|---|---|---|---|",
        f"| local[{low}] | {', '.join(f'{t:.2f}' for t in tot_low)} "
        f"| {med(tot_low):.2f} | {tot_low[0]:.2f} |",
        f"| local[{high}] | {', '.join(f'{t:.2f}' for t in tot_high)} "
        f"| {med(tot_high):.2f} | {tot_high[0]:.2f} |",
        "",
        f"Merged-minima evidence above folds in prior sessions **at engine "
        f"fingerprint {fp} only** (hash of the package + bench harness — "
        f"recorded here at git SHA {sha}); timings from older engine code "
        f"are excluded.",
        "",
        f"Core total = the {len(CORE)} partition-parallel engine queries.",
        "The remaining suite entries are excluded because their runtime is",
        "dominated by fixed latency (plan compile, tiny result sets), not",
        "partition-parallel task work — a 4x core grant cannot speed up a",
        "latency-bound job. Local-mode strong scaling on a fixed-size",
        "problem is the harshest proxy: every fixed cost (driver-side plan",
        "compile, Python worker spin-up, single shared JVM heap/GC) is paid",
        "identically at both levels, whereas real N->4N executors add heap,",
        "GC headroom, and shuffle service capacity with the cores.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r_low),
        json.dumps(r_high),
        "```",
    ]
    # auxiliary evidence (heavy-geocode runs, methodology appendix) lives in
    # BENCH_APPENDIX.md so regenerating the core tables never drops it
    if os.path.exists("BENCH_APPENDIX.md"):
        lines += ["", open("BENCH_APPENDIX.md").read().rstrip()]
    with open("BENCH.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"low": core_low, "high": core_high,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
