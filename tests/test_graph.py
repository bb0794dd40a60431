"""Containment graph parity with GraphBuilderSpec.scala:16-93.

Each spec scenario builds the graph from a SUBSET of areas; our declarative
formulation is insertion-order-free by construction, so the
"insertion order should not effect trickle down" cases collapse into the
same assertion.
"""

import pytest
from pyspark.sql import functions as F

from osm_jigsaw_spark.operators.containment import graph_edges

L = {"Large": "100W", "Medium": "101W", "Small": "102W", "Left": "103W",
     "Right": "104W", "Overlapping": "105W", "Fits": "106W"}


def _edges_for(pipeline, names):
    keys = [L[n] for n in names]
    subset = pipeline.areas.filter(F.col("canonical_osm_id").isin(keys))
    rows = graph_edges(subset).select("parent_osm_id", "child_osm_id").collect()
    return {(r["parent_osm_id"], r["child_osm_id"]) for r in rows}


def test_insert_as_children_of_head(pipeline):
    assert _edges_for(pipeline, ["Large"]) == {("-1", L["Large"])}


def test_non_overlapping_same_level(pipeline):
    got = _edges_for(pipeline, ["Large", "Left", "Right"])
    assert got == {
        ("-1", L["Large"]),
        (L["Large"], L["Left"]),
        (L["Large"], L["Right"]),
    }


def test_sift_down_into_enclosing_sibling(pipeline):
    got = _edges_for(pipeline, ["Large", "Small"])
    assert got == {("-1", L["Large"]), (L["Large"], L["Small"])}


def test_trickle_down(pipeline):
    got = _edges_for(pipeline, ["Large", "Medium", "Small"])
    assert got == {
        ("-1", L["Large"]),
        (L["Large"], L["Medium"]),
        (L["Medium"], L["Small"]),
    }


def test_multi_parent_fits_in_left_and_overlapping(pipeline):
    got = _edges_for(pipeline, ["Left", "Overlapping", "Fits"])
    assert (L["Left"], L["Fits"]) in got
    assert (L["Overlapping"], L["Fits"]) in got
    assert ("-1", L["Left"]) in got and ("-1", L["Overlapping"]) in got


def test_full_world_edges(pipeline):
    rows = pipeline.graph_edges.select(
        "parent_osm_id", "child_osm_id").collect()
    got = {(r["parent_osm_id"], r["child_osm_id"]) for r in rows}
    expected = {
        ("-1", "100W"), ("-1", "200R"), ("-1", "201R"), ("-1", "302W"),
        ("100W", "103W"), ("100W", "104W"), ("100W", "105W"),
        ("105W", "101W"), ("101W", "102W"),
        ("102W", "106W"), ("103W", "106W"),
        ("201R", "202R"),
    } | {("-1", "203R"), ("-1", "204R")}
    assert expected <= got
    # nothing unexpected beyond the multi-ring root duplicates
    extra = got - expected
    assert all(p == "-1" and c in ("203R", "204R") for p, c in extra)


def test_dedup_merged_twins(pipeline):
    row = pipeline.areas.filter(
        F.col("canonical_osm_id") == "302W").collect()
    assert len(row) == 1
    assert sorted(row[0]["osm_ids"]) == ["302W", "303W"]


def test_expected_area_values(pipeline, world):
    got = {
        (r["canonical_osm_id"], r["n_points"]): r["area"]
        for r in pipeline.areas.collect()
    }
    for e in world.expected_areas:
        key = (e["canonical_osm_id"], e["n_points"])
        assert key in got
        assert got[key] == pytest.approx(e["area"], rel=1e-9)
    assert len(got) == len(world.expected_areas)


def test_walk_path_prefix_semantics(spark, pipeline):
    from osm_jigsaw_spark.operators.paths import walk_path
    # Large -> Overlapping -> Medium -> Small is the fixture's known chain
    # (GraphBuilderSpec.scala:64-73 analog); the appended Small -> Left step
    # is not an edge, so the walk must stop before it.
    got = walk_path(pipeline.graph_edges,
                    ["100W", "105W", "101W", "102W", "103W"]).collect()
    chains = [(r["pos"], r["parent_osm_id"], r["child_osm_id"]) for r in got]
    assert chains == [(0, "-1", "100W"), (1, "100W", "105W"),
                      (2, "105W", "101W"), (3, "101W", "102W")]
    assert all(r["ok"] for r in got)


def test_walk_path_invalid_first_step(spark, pipeline):
    from osm_jigsaw_spark.operators.paths import walk_path
    assert walk_path(pipeline.graph_edges, ["102W"]).count() == 0
