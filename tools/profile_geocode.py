"""Ad-hoc: decompose geocode_batch wall time — index build vs containment
probe vs path enumeration. Usage: python tools/profile_geocode.py [cpus]
[n_areas] [n_points] [reps]
"""
from __future__ import annotations

import os
import sys
import time

for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jigsaw_spark.fixtures.scaled_docs import scaled_documents_df  # noqa: E402
from osm_jigsaw_spark.operators.containment import (  # noqa: E402
    area_cell_index,
    contains_pairs,
    graph_edges,
)
from osm_jigsaw_spark.operators import geocode as G  # noqa: E402
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.plans.snapshots import snapshot  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_areas = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_points = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = get_spark(app_name="geocode-profile", cores=cpus,
                      shuffle_partitions=cpus)
    docs = snapshot(scaled_documents_df(spark, n_areas), "docs")
    pipe = run_pipeline(docs, cache=False, has_relations=False)
    areas = snapshot(pipe.areas, "areas")
    pairs = snapshot(contains_pairs(areas), "pairs")
    edges = snapshot(graph_edges(areas, pairs), "edges")
    pts = spark.range(n_points).select(
        F.concat(F.lit("p"), F.col("id")).alias("point_id"),
        (F.lit(-60.0) + (F.col("id") * 2654435761 % 4294967296)
         / 4294967296.0 * 120.0).alias("lat"),
        (F.lit(-120.0) + (F.col("id") * 40503 % 65536)
         / 65536.0 * 240.0).alias("lon"),
    )
    pts = snapshot(pts, "pts")

    best = {}
    n = 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        idx = snapshot(area_cell_index(areas), "idx")
        t1 = time.time()
        G.areas_containing_points(areas, pts, idx=idx).count()
        t1b = time.time()
        containing = snapshot(
            G.areas_containing_points(areas, pts, idx=idx), "containing")
        t2 = time.time()
        n = G.geocode_paths_grouped(edges, containing).count()
        t3 = time.time()
        phases = {"index": t1 - t0, "containing_compute": t1b - t1,
                  "containing_with_barrier": t2 - t1b,
                  "paths": t3 - t2, "total": t3 - t0}
        for k, v in phases.items():
            if k not in best or v < best[k]:
                best[k] = v
    print({k: round(v, 2) for k, v in best.items()}, "paths:", n,
          "cpus:", cpus)


if __name__ == "__main__":
    main()
