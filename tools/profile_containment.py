"""Ad-hoc: decompose containment_graph wall time (VERDICT r4 task 3 — the
~50% fixed-cost floor at local[16] needs an owner, like profile_pipeline.py
gave pipeline_areas one).

Times TRUNCATED versions of the exact bench plan from the same
areas/idx snapshots; the DELTA between consecutive cuts attributes the
incremental cost of that stage inside the real plan:

  cut_candidates — cell-join candidates + bbox/area codegen filters only
  cut_pairs      — + rect fast path / Arrow PIP kernel (contains_pairs)
  cut_snap       — + the pairs stage barrier (snapshot write+read)
  cut_reduce     — + transitive reduction self-join/anti-join
  cut_full       — the bench f_containment exactly (both barriers + count)

Run at two parallelism levels (e.g. 4 and 16) to see which stage owns the
non-scaling floor. Usage:
  python tools/profile_containment.py [cpus] [n_areas] [reps]
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
from osm_jigsaw_spark.functions import cells as C  # noqa: E402
from osm_jigsaw_spark.operators.containment import (  # noqa: E402
    area_cell_index,
    bbox_contains_expr,
    contains_pairs,
    graph_edges,
    transitive_reduction,
)
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.plans.snapshots import snapshot  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_areas = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name="containment-profile", cores=cpus,
                      shuffle_partitions=cpus)
    docs = snapshot(scaled_documents_df(spark, n_areas), "docs")
    areas = snapshot(
        run_pipeline(docs, cache=False, has_relations=False).areas, "areas")
    idx = snapshot(area_cell_index(areas), "idx")

    def candidates_plan():
        parents = idx.select(
            "cell", F.col("area_key").alias("parent_key"),
            F.col("area").alias("parent_area"),
            F.col("bbox").alias("parent_bbox"))
        children = areas.select(
            F.col("ring_hash").alias("child_key"),
            F.col("area").alias("child_area"),
            F.col("bbox").alias("child_bbox"),
            F.explode(C.point_cells_all_res(
                (F.col("bbox.min_lat") + F.col("bbox.max_lat")) / 2,
                (F.col("bbox.min_lon") + F.col("bbox.max_lon")) / 2,
            )).alias("cell"))
        return (parents.join(children, "cell")
                .filter(F.col("parent_key") != F.col("child_key"))
                .filter(bbox_contains_expr("parent_bbox", "child_bbox"))
                .filter(F.col("parent_area") >= F.col("child_area")))

    def cut_candidates():
        candidates_plan().count()

    def cut_pairs():
        contains_pairs(areas, idx=idx).count()

    def cut_snap():
        snapshot(contains_pairs(areas, idx=idx), "pairs").count()

    def cut_reduce():
        pairs = snapshot(contains_pairs(areas, idx=idx), "pairs")
        transitive_reduction(pairs).count()

    def cut_full():
        pairs = snapshot(contains_pairs(areas, idx=idx), "pairs")
        snapshot(graph_edges(areas, pairs), "edges").count()

    cuts = [("cut_candidates", cut_candidates), ("cut_pairs", cut_pairs),
            ("cut_snap", cut_snap), ("cut_reduce", cut_reduce),
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
    print({k: round(v, 2) for k, v in best.items()},
          "cpus:", cpus, "n_areas:", n_areas)


if __name__ == "__main__":
    main()
