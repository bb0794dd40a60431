"""Targeted geocode strong-scaling measurement.

The full-suite scaling run (tools/bench_scaling.py) sizes the geocode
point set with the area count; at 600k points the query's ~5 s
non-parallel floor (driver-side descent-loop planning across graph
levels) is ~half its local[16] runtime, which caps measured efficiency
well below what the per-point work actually scales at. This tool times
ONLY geocode, with a point set sized independently of the world, so the
scalable per-point cost dominates — the quantity the north-rule
efficiency claim is about. Appends to BENCH_HISTORY.jsonl tagged
`series: "geocode_heavy"` so bench_scaling's core-suite minima merge
never folds these rows in, one JSON line to stdout.

Usage: python tools/bench_geocode.py [cpus] [n_areas] [n_points] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from osm_jigsaw_spark.fixtures.scaled_docs import scaled_documents_df  # noqa: E402
from osm_jigsaw_spark.operators.containment import (  # noqa: E402
    area_cell_index,
    contains_pairs,
    graph_edges,
)
from osm_jigsaw_spark.operators.geocode import geocode  # noqa: E402
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_areas = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    n_points = int(sys.argv[3]) if len(sys.argv) > 3 else 2_400_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    spark = get_spark(app_name="osm-jigsaw-geocode-bench", cores=cpus,
                      shuffle_partitions=cpus)
    docs = scaled_documents_df(spark, n_areas).localCheckpoint(eager=True)
    pipe = run_pipeline(docs, cache=False, has_relations=False)
    areas = pipe.areas.localCheckpoint(eager=True)
    idx = area_cell_index(areas).localCheckpoint(eager=True)
    pairs = contains_pairs(areas, idx=idx).localCheckpoint(eager=True)
    edges = graph_edges(areas, pairs).localCheckpoint(eager=True)

    # same deterministic columnar point generator as bench.py — identical
    # input at every parallelism level
    pts = spark.range(n_points).select(
        F.concat(F.lit("p"), F.col("id")).alias("point_id"),
        (F.lit(-60.0) + (F.col("id") * 2654435761 % 4294967296)
         / 4294967296.0 * 120.0).alias("lat"),
        (F.lit(-120.0) + (F.col("id") * 40503 % 65536)
         / 65536.0 * 240.0).alias("lon"),
    ).localCheckpoint(eager=True)

    best, n_paths = None, 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        n_paths = geocode(areas, edges, pts, idx=idx).count()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt

    out = {"cpus": cpus, "n_areas": n_areas, "n_points": n_points,
           "geocode_sec": round(best, 3),
           "geocode_lookups_per_sec": round(n_points / best, 1),
           "n_geocode_paths": n_paths}
    import subprocess
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    from bench_scaling import engine_fingerprint
    with open("BENCH_HISTORY.jsonl", "a") as f:
        f.write(json.dumps({
            "sha": sha, "fp": engine_fingerprint(), "cpus": cpus,
            "series": "geocode_heavy",  # excluded from core minima merge
            "n_areas": n_points,
            "sf": None,  # synthetic scaled world; no sf testdata involved
            "queries": {"geocode_heavy": out["geocode_sec"]},
            "extra": out}) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
