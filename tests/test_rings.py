"""Ring stitching + relation expansion parity with the reference specs.

Mirrors OutlineBuilderSpec.scala:30-51, OuterWayResolverSpec.scala:13-45,
AreaResolverSpec.scala:21-108, RelationExpanderSpec.scala:31-65 on the
synthetic analogs (FIXTURES.md §3b).
"""

from pyspark.sql import functions as F

from osm_jigsaw_spark.operators.relations import expansion_status, outer_way_ids
from osm_jigsaw_spark.operators.rings import stitch_rings


def _rings_for(pipeline, rel_id):
    outer = outer_way_ids(pipeline.relations.filter(F.col("rel_id") == rel_id))
    with_nodes = outer.join(
        pipeline.ways.select("way_id", "node_ids"), "way_id"
    ).select("rel_id", "way_id", "pos", "node_ids")
    return stitch_rings(with_nodes).collect()


def test_richmond_one_ring_of_14(pipeline):
    rings = _rings_for(pipeline, 200)
    assert len(rings) == 1
    assert rings[0]["n_ways"] == 14


def test_bournemouth_17_ways_excludes_subarea(pipeline):
    # subarea member relation's way must NOT leak into the outline
    outer = outer_way_ids(pipeline.relations.filter("rel_id = 201"))
    assert outer.count() == 17
    rings = _rings_for(pipeline, 201)
    assert len(rings) == 1
    assert rings[0]["n_ways"] == 17


def test_nyc_60_outer_ways_three_rings(pipeline):
    outer = outer_way_ids(pipeline.relations.filter("rel_id = 203"))
    assert outer.count() == 60
    rings = _rings_for(pipeline, 203)
    assert sorted(r["n_ways"] for r in rings) == [1, 19, 40]


def test_nz_four_rings(pipeline):
    rings = _rings_for(pipeline, 204)
    assert len(rings) == 4


def test_circular_relation_rejected(pipeline, world):
    st = {r["rel_id"]: r for r in expansion_status(pipeline.relations).collect()}
    assert not st[205]["is_expandable"]
    assert not st[206]["is_expandable"]
    assert st[205]["hit_cycle"] and st[206]["hit_cycle"]
    for ok_rel in (200, 201, 202, 203, 204):
        assert st[ok_rel]["is_expandable"]
    # and no areas came out of the circular pair
    bad = pipeline.areas.filter(
        F.arrays_overlap("osm_ids", F.array(F.lit("205R"), F.lit("206R")))
    ).count()
    assert bad == 0


def test_open_and_unnamed_ways_excluded(pipeline):
    ids = [r["canonical_osm_id"] for r in
           pipeline.areas.select("canonical_osm_id").collect()]
    assert "300W" not in ids   # open named way dropped
    assert "301W" not in ids   # unnamed closed way filtered


def test_reversed_way_stitching(spark):
    # explicit mixed-direction mini case: 3 ways, middle reversed
    rows = [
        (1, 10, 0, [1, 2]),
        (1, 11, 1, [3, 2]),   # reversed: tail joins at node 2
        (1, 12, 2, [3, 1]),
    ]
    df = spark.createDataFrame(
        rows, "rel_id long, way_id long, pos long, node_ids array<long>")
    out = stitch_rings(df).collect()
    assert len(out) == 1
    assert out[0]["way_ids"] == [10, -11, 12]
    assert out[0]["node_ids"] == [1, 2, 2, 3, 3, 1]
