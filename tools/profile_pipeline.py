"""Ad-hoc: decompose pipeline_areas wall time (VERDICT r3 task 3 — the 76%
fixed-cost floor at local[16] needs an owner).

Times TRUNCATED versions of the exact fused bench plan (no intermediate
checkpoints — adding materialization barriers between phases was measured to
distort the split by an order of magnitude at low parallelism, because a
rings-table localCheckpoint serializes every coordinate array). Each cut
re-runs the plan from the shared docs checkpoint, so the DELTA between
consecutive cuts attributes the incremental cost of that stage inside the
real plan:

  cut_decode   — count(ways) + count(nodes)
  cut_resolve  — count through resolve_outline_points + n_points filter
  cut_measure  — ... + shoelace area + bbox
  cut_full     — the bench plan (dedup_areas + localCheckpoint + count)

Usage: python tools/profile_pipeline.py [cpus] [n_areas] [reps]
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
from osm_jigsaw_spark.operators import areas as A  # noqa: E402
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402
from osm_jigsaw_spark.sources import documents as D  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_areas = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name="pipeline-profile", cores=cpus,
                      shuffle_partitions=cpus)
    docs = scaled_documents_df(spark, n_areas).localCheckpoint(eager=True)

    def rings_plan():
        return (A.resolve_outline_points(
                    A.way_outlines(D.decode_ways(docs)),
                    D.decode_nodes(docs))
                .filter(F.col("n_points") >= 3))

    def cut_decode():
        D.decode_ways(docs).count()
        D.decode_nodes(docs).count()

    def cut_resolve():
        rings_plan().count()

    def cut_measure():
        A.with_area_and_bbox(rings_plan()).count()

    def cut_dedup():
        A.dedup_areas(A.with_area_and_bbox(rings_plan())).count()

    def cut_full():
        pipe = run_pipeline(docs, cache=False, has_relations=False)
        pipe.areas.localCheckpoint(eager=True).count()

    cuts = [("cut_decode", cut_decode), ("cut_resolve", cut_resolve),
            ("cut_measure", cut_measure), ("cut_dedup", cut_dedup),
            ("cut_full", cut_full)]
    best: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in cuts:
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = dt

    deltas = {
        "d_decode": best["cut_decode"],
        "d_resolve": best["cut_resolve"] - best["cut_decode"],
        "d_measure": best["cut_measure"] - best["cut_resolve"],
        "d_dedup": best["cut_dedup"] - best["cut_measure"],
        "d_ckpt": best["cut_full"] - best["cut_dedup"],
    }
    print({k: round(v, 2) for k, v in best.items()})
    print({k: round(v, 2) for k, v in deltas.items()}, "cpus:", cpus,
          "n_areas:", n_areas)


if __name__ == "__main__":
    main()
