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
