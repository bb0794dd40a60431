"""JSON sink (S9): rendered OutputNode/path JSON parses back with the
expected fields; the JSON-lines sink round-trips through spark.read.json."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from osm_jigsaw_spark.operators.geocode import geocode
from osm_jigsaw_spark.sources.json_sink import (
    render_nodes,
    render_paths,
    write_json,
)


def test_render_nodes_shape(spark, pipeline):
    rows = render_nodes(pipeline.areas, pipeline.graph_edges,
                        pipeline.tags).collect()
    assert len(rows) == pipeline.areas.count()
    large = None
    for r in rows:
        obj = json.loads(r.json)
        assert set(obj) == {"id", "entities", "children", "area"}
        assert all(set(e) == {"osmId", "name"} for e in obj["entities"])
        if any(e["name"] == "Large" for e in obj["entities"]):
            large = obj
    assert large is not None
    assert large["children"] > 0  # Large contains other rects


def test_render_paths_shape(spark, pipeline, qpoints):
    paths = geocode(pipeline.areas, pipeline.graph_edges, qpoints)
    rows = render_paths(paths).collect()
    assert rows
    for r in rows:
        obj = json.loads(r.json)
        assert obj["point"] == r.point_id
        assert isinstance(obj["nodes"], list) and obj["nodes"]


def test_write_json_roundtrip(spark, pipeline, tmp_path):
    out = str(tmp_path / "nodes_json")
    df = render_nodes(pipeline.areas, pipeline.graph_edges, pipeline.tags)
    write_json(df, out)
    back = spark.read.json(out)
    assert back.count() == df.count()
    assert {"area_key", "json"} <= set(back.columns)
