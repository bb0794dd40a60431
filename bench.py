"""Benchmark harness — prints ONE JSON line.

Headline queries:
- pipeline_areas:    documents(spans) decode → stitched/deduped areas table
                     on the scaled synthetic world (SPARK_GRAFT_BENCH_AREAS
                     areas, default 20,000 — includes 3 mega-areas for skew)
- containment_graph: grid-prefiltered containment join + transitive
                     reduction (the reference's 14-hour "graph" step;
                     BASELINE.json: areas/sec)
- geocode_batch:     batch point→path geocode, SPARK_GRAFT_BENCH_POINTS
                     points (default 20,000; BASELINE.json: lookups/sec)
- tile_assignments:  res-2 geohash tiling of the scaled world
- minhash_near_dups / cosine_topk / agg_pricing / revenue_by_nation:
                     training-data + relational operators on the driver's
                     testdata at $SPARK_GRAFT_SF_DIR

The sandbox host is time-shared (firecracker, visible steal-time spikes), so
wall-clock for a single run is noisy up to several-fold — and the noise
bursts last MINUTES, longer than any single query. Two nested repeat knobs
suppress it:

- SPARK_GRAFT_BENCH_ROUNDS (default 3): the whole suite runs this many
  times in one JVM and each query reports its MINIMUM across rounds. Rounds
  of the same query are separated by a full suite pass (~the only way to
  decorrelate from multi-minute noise bursts inside one process), and round
  1 pays the one-time JVM/JIT warmup which the min then discards.
- SPARK_GRAFT_BENCH_REPS (default 1): back-to-back in-place repeats of each
  timed query before moving on (the round-1..4 mechanism; kept for the
  scaling harness). The Spark cache is cleared between reps/rounds so every
  timing recomputes the full plan (verified: a rep on a FRESH, different
  lineage is as fast as a same-lineage rep — no shuffle/exchange reuse).

Why min-of-repeats and not single-shot: the FIRST execution of each heavy
plan shape in a fresh JVM is dominated by one-time JVM/JIT warmup —
measured 114 s cold vs 9.3 s warm for the 600k-area pipeline at
local[24], reproducible with whole-stage codegen disabled, with a warm
Python-worker pool, and across engine versions. On a real cluster a job
over 100 TB runs for hours and that warmup amortizes to nothing, so
steady-state (warm) throughput is the quantity that predicts production
behavior; round 1 pays the warmup and the min discards it. (VERDICT r4
item 4: the single-shot face JSON contradicted the repo's quiet-window
minima two rounds running — the default is now min-of-3.)

Stage barriers: every heavy materialization goes through
plans/snapshots.snapshot() — localCheckpoint by default after the round-5
interleaved A/B vs a disk-parquet barrier (checkpoint won the core suite
68.3 s vs 104.0 s at local[16]; BENCH_APPENDIX.md); override with
SPARK_GRAFT_BARRIER=parquet.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

# BLAS single-threading must precede the first numpy import (operator
# modules import numpy at module load, and OpenBLAS pools initialize then)
# — setting these inside get_spark is too late for the DRIVER process
# (ADVICE r1); executors still get them via spark.executorEnv.*.
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from osm_jigsaw_spark.fixtures.scaled_docs import (  # noqa: E402
    scaled_documents_df,
    scaled_embeddings,
    scaled_text_docs,
)
from osm_jigsaw_spark.operators.containment import (  # noqa: E402
    area_cell_index,
    contains_pairs,
    graph_edges,
)
from osm_jigsaw_spark.operators.geocode import geocode  # noqa: E402
from osm_jigsaw_spark.operators.tiling import tile_assignments  # noqa: E402
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.plans.snapshots import (  # noqa: E402
    DEFAULT_MODE,
    snapshot,
)
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_areas = int(os.environ.get("SPARK_GRAFT_BENCH_AREAS", "20000"))
    n_points = int(os.environ.get("SPARK_GRAFT_BENCH_POINTS", "20000"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1

    spark = get_spark(app_name="osm-jigsaw-bench", cores=cpus,
                      shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    state: dict[str, object] = {}

    def timed(name: str, fn) -> None:
        best = None
        best_extra: dict[str, float] = {}
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn() or {}
            dt = time.time() - t0
            if best is None or dt < best:
                best, best_extra = dt, out
        if name not in timings or best < timings[name]:
            timings[name] = round(best, 3)
            extra.update(best_extra)

    # --- scaled spatial world (generated IN Spark — no driver bottleneck)
    docs = snapshot(scaled_documents_df(spark, n_areas), "docs")

    # scale-variant training-data inputs (generated in Spark and sized with
    # the world, so per-row work dominates fixed overhead)
    from osm_jigsaw_spark.operators.dedup import minhash_near_duplicates
    from osm_jigsaw_spark.operators.similarity import brute_force_topk

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(n_areas)))
    big_docs = snapshot(scaled_text_docs(spark, n_docs), "bigdocs")
    big_emb = snapshot(scaled_embeddings(spark, n_docs), "bigemb")

    # deterministic columnar point generation: identical input at every
    # parallelism level (no RNG, no partitioning dependence)
    from pyspark.sql import functions as F
    pts = snapshot(spark.range(n_points).select(
        F.concat(F.lit("p"), F.col("id")).alias("point_id"),
        (F.lit(-60.0) + (F.col("id") * 2654435761 % 4294967296)
         / 4294967296.0 * 120.0).alias("lat"),
        (F.lit(-120.0) + (F.col("id") * 40503 % 65536)
         / 65536.0 * 240.0).alias("lon"),
    ), "pts")

    for _ in range(rounds):
        def f_pipeline():
            # scaled_documents_df emits only way+node docs — skip the
            # ~10-stage relation sub-plan via the caller hint (lazy, no
            # isEmpty() probe job; ADVICE r1)
            pipe = run_pipeline(docs, cache=False, has_relations=False)
            state["areas"] = snapshot(pipe.areas, "areas")
            n = state["areas"].count()
            return {"n_areas": n}

        timed("pipeline_areas", f_pipeline)
        areas = state["areas"]

        # the ONE spatial index: built+materialized once per areas snapshot
        # (timed as its own suite entry), then shared by the containment,
        # geocode and kNN consumers — the architecture a 100 TB run uses
        # (index = an Iceberg-snapshot artifact, not a per-query rebuild)
        def f_cell_index():
            state["idx"] = snapshot(area_cell_index(areas), "idx")
            return {"n_index_cells": state["idx"].count()}

        timed("cell_index", f_cell_index)
        idx = state["idx"]

        def f_containment():
            pairs = snapshot(contains_pairs(areas, idx=idx), "pairs")
            state["edges"] = snapshot(graph_edges(areas, pairs), "edges")
            n = state["edges"].count()
            return {
                "containment_areas_per_sec": 0.0,  # filled below
                "n_edges": n,
            }

        timed("containment_graph", f_containment)
        edges = state["edges"]

        def f_geocode():
            return {"n_geocode_paths":
                    geocode(areas, edges, pts, idx=idx).count()}

        timed("geocode_batch", f_geocode)

        timed("tile_assignments", lambda: {
            "n_tile_assignments":
            tile_assignments(spark, areas, res=2).count()})

        # --- training-data + relational operators on testdata -------------
        def run_query(fn):
            fn(spark, sf_dir).count()

        for name in ("minhash_near_dups", "cosine_topk", "agg_pricing",
                     "revenue_by_nation"):
            fn = E.queries()[name]
            timed(name, lambda fn=fn: run_query(fn))

        def f_minhash_scaled():
            return {"n_near_dup_pairs":
                    minhash_near_duplicates(big_docs, 0.5).count()}

        def f_cosine_scaled():
            return {"n_topk_rows":
                    brute_force_topk(big_emb, n_queries=128, k=5).count()}

        timed("minhash_scaled", f_minhash_scaled)
        timed("cosine_scaled", f_cosine_scaled)

    extra["containment_areas_per_sec"] = round(
        extra["n_areas"] / timings["containment_graph"], 1)
    extra["geocode_lookups_per_sec"] = round(
        n_points / timings["geocode_batch"], 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "osm-jigsaw-spark headline suite (containment areas/sec + "
                  "geocode lookups/sec + dedup/similarity/relational)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "rounds": rounds,
        "reps": reps,
        "n_docs": n_docs,
        "barrier": os.environ.get("SPARK_GRAFT_BARRIER", DEFAULT_MODE),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
