"""Ad-hoc: decompose tile_assignments wall time — tile dim generation vs
covering join+refine. Usage: python tools/profile_tiles.py [cpus] [n_areas]
[res] [reps]
"""
from __future__ import annotations

import os
import sys
import time

for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_jigsaw_spark.fixtures.scaled_docs import scaled_documents_df  # noqa: E402
from osm_jigsaw_spark.functions import cells as C  # noqa: E402
from osm_jigsaw_spark.operators.tiling import tile_assignments  # noqa: E402
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_areas = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = get_spark(app_name="tiles-profile", cores=cpus,
                      shuffle_partitions=cpus)
    docs = scaled_documents_df(spark, n_areas).localCheckpoint(eager=True)
    pipe = run_pipeline(docs, cache=False, has_relations=False)
    areas = pipe.areas.localCheckpoint(eager=True)

    best = {}
    n = 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        tiles = C.geohash_tiles(spark, res).localCheckpoint(eager=True)
        n_t = tiles.count()
        t1 = time.time()
        n = tile_assignments(spark, areas, res=res).count()
        t2 = time.time()
        phases = {"tile_dim": t1 - t0, "assign": t2 - t1, "total": t2 - t0}
        for k, v in phases.items():
            if k not in best or v < best[k]:
                best[k] = v
    print({k: round(v, 2) for k, v in best.items()},
          "tiles:", n_t, "assignments:", n, "cpus:", cpus)


if __name__ == "__main__":
    main()
