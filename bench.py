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

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from osm_jigsaw_spark.fixtures.scaled_docs import scaled_documents_df  # noqa: E402
from osm_jigsaw_spark.operators.containment import (  # noqa: E402
    contains_pairs,
    graph_edges,
)
from osm_jigsaw_spark.operators.geocode import geocode  # noqa: E402
from osm_jigsaw_spark.operators.tiling import tile_assignments  # noqa: E402
from osm_jigsaw_spark.plans.pipeline import run_pipeline  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_areas = int(os.environ.get("SPARK_GRAFT_BENCH_AREAS", "20000"))
    n_points = int(os.environ.get("SPARK_GRAFT_BENCH_POINTS", "20000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1

    spark = get_spark(app_name="osm-jigsaw-bench", cores=cpus,
                      shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- scaled spatial world (generated IN Spark — no driver bottleneck)
    docs = scaled_documents_df(spark, n_areas).localCheckpoint(eager=True)

    t0 = time.time()
    pipe = run_pipeline(docs, cache=False)
    areas = pipe.areas.localCheckpoint(eager=True)
    n_area_rows = areas.count()
    timings["pipeline_areas"] = round(time.time() - t0, 3)

    t0 = time.time()
    pairs = contains_pairs(areas).localCheckpoint(eager=True)
    edges = graph_edges(areas, pairs).localCheckpoint(eager=True)
    n_edges = edges.count()
    timings["containment_graph"] = round(time.time() - t0, 3)
    extra["containment_areas_per_sec"] = round(
        n_area_rows / timings["containment_graph"], 1)
    extra["n_areas"] = n_area_rows
    extra["n_edges"] = n_edges

    # deterministic columnar point generation: identical input at every
    # parallelism level (no RNG, no partitioning dependence)
    from pyspark.sql import functions as F
    pts = spark.range(n_points).select(
        F.concat(F.lit("p"), F.col("id")).alias("point_id"),
        (F.lit(-60.0) + (F.col("id") * 2654435761 % 4294967296)
         / 4294967296.0 * 120.0).alias("lat"),
        (F.lit(-120.0) + (F.col("id") * 40503 % 65536)
         / 65536.0 * 240.0).alias("lon"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    n_paths = geocode(areas, edges, pts).count()
    timings["geocode_batch"] = round(time.time() - t0, 3)
    extra["geocode_lookups_per_sec"] = round(
        n_points / timings["geocode_batch"], 1)
    extra["n_geocode_paths"] = n_paths

    t0 = time.time()
    n_assign = tile_assignments(spark, areas, res=2).count()
    timings["tile_assignments"] = round(time.time() - t0, 3)
    extra["n_tile_assignments"] = n_assign

    # --- training-data + relational operators on testdata ----------------
    for name in ("minhash_near_dups", "cosine_topk", "agg_pricing",
                 "revenue_by_nation"):
        fn = E.queries()[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "osm-jigsaw-spark headline suite (containment areas/sec + "
                  "geocode lookups/sec + dedup/similarity/relational)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
