"""Geocode descent + kNN + tiling parity (FIXTURES.md §4 expectations)."""

from pyspark.sql import functions as F

from osm_jigsaw_spark.functions.cells import geohash_encode_np
from osm_jigsaw_spark.operators.geocode import geocode
from osm_jigsaw_spark.operators.knn import knn_areas
from osm_jigsaw_spark.operators.tiling import tile_assignments, tile_counts

import numpy as np


def _paths(pipeline, qpoints):
    rows = geocode(pipeline.areas, pipeline.graph_edges, qpoints).collect()
    out = {}
    for r in rows:
        out.setdefault(r["point_id"], set()).add(tuple(r["path"]))
    return out


def test_geocode_paths(pipeline, qpoints):
    got = _paths(pipeline, qpoints)
    assert got["p_small"] == {
        ("100W", "105W", "101W", "102W"),
        ("100W", "104W"),
    }
    assert got["p_fits"] == {
        ("100W", "105W", "101W", "102W", "106W"),
        ("100W", "103W", "106W"),
    }
    assert got["p_holdenhurst"] == {("201R", "202R")}
    assert got["p_richmond"] == {("200R",)}
    assert "p_ocean" not in got  # no enclosing areas → no rows


def test_tile_grid_counts(spark):
    assert tile_counts(spark, 1) == 32
    assert tile_counts(spark, 2) == 1024
    assert tile_counts(spark, 3) == 32768


def test_geohash_encode_known_values():
    # canonical geohash test vector: (57.64911, 10.40744) → u4pruyd...
    got = geohash_encode_np(np.array([57.64911]), np.array([10.40744]), 3)
    assert got[0] == "u4p"
    got1 = geohash_encode_np(np.array([0.0]), np.array([0.0]), 1)
    assert got1[0] == "s"


def test_tile_assignments_rect_world(spark, pipeline):
    ta = tile_assignments(spark, pipeline.areas, 1)
    got = {}
    for r in ta.collect():
        got.setdefault(r["canonical_osm_id"], set()).add(r["tile_id"])
    # Large spans the four res-1 cells around (0,0): 7/e/k/s
    assert got["100W"] == {"7", "e", "k", "s"}
    # Right is lat>=0 → only northern cells e/s... (lon -10..10)
    assert got["104W"] == {"e", "s"}
    # richmond fits in one tile; its center encodes to that tile
    assert got["200R"] == {geohash_encode_np(np.array([30.0]), np.array([30.0]), 1)[0]}
    assert got["302W"] == {geohash_encode_np(np.array([60.0]), np.array([60.0]), 1)[0]}


def test_knn(pipeline, qpoints):
    res = knn_areas(pipeline.areas, qpoints, k=3)
    rows = [r for r in res.collect() if r["point_id"] == "p_richmond"]
    assert rows and rows[0]["canonical_osm_id"] == "200R"
    assert rows[0]["distance"] == 0.0


def test_write_tiled_segments(spark, pipeline, tmp_path):
    """G7 per-tile partitioned output: the reference's per-geohash
    graph/areas/tags segment files (steps/Tiling.scala:100-133) as
    partitionBy(tile_id) tables; a tile-pruned read is the API's
    per-geohash segment fetch (GraphService.scala:93-110)."""
    import os

    from pyspark.sql import functions as F

    from osm_jigsaw_spark.operators.tiling import (
        tile_assignments,
        write_tiled_segments,
    )

    assign = tile_assignments(spark, pipeline.areas, res=1)
    counts = write_tiled_segments(
        str(tmp_path / "tiles"), pipeline.areas, pipeline.graph_edges,
        pipeline.tags, assign)
    assert counts["areas"] == assign.count()  # one row per assignment
    assert counts["graph"] > 0 and counts["tags"] > 0

    # physical layout is hive-partitioned by tile_id
    parts = [d for d in os.listdir(tmp_path / "tiles" / "areas")
             if d.startswith("tile_id=")]
    assert len(parts) == assign.select("tile_id").distinct().count()

    # partition-pruned read returns exactly that tile's areas
    some_tile = parts[0].split("=", 1)[1]
    pruned = spark.read.parquet(str(tmp_path / "tiles" / "areas")).filter(
        F.col("tile_id") == some_tile)
    expect = assign.filter(F.col("tile_id") == some_tile).count()
    assert pruned.count() == expect


def test_geocode_grouped_vs_iterated_parity(pipeline, qpoints):
    """The two path-enumeration formulations — single-pass grouped
    mapInPandas (the fast path) and the level-iterated join variant
    (geocode.geocode_paths) — must produce identical row multisets, so the
    formulations cannot drift (VERDICT r3 next-round item 8)."""
    fast = geocode(pipeline.areas, pipeline.graph_edges, qpoints,
                   grouped=True)
    slow = geocode(pipeline.areas, pipeline.graph_edges, qpoints,
                   grouped=False)

    def norm(df):
        return sorted(
            (r["point_id"], tuple(r["path"]), tuple(r["path_keys"]))
            for r in df.collect())

    assert norm(fast) == norm(slow)
