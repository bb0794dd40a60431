"""Area assembly: outlines → node-resolved polygons → deduplicated areas table.

Re-expresses the reference stages `areaways` + `areas`
(steps/ExtractAreas.scala:19-100, steps/RenderAndDeduplicateAreas.scala:20-124):

- way outlines: named *closed* ways become single-ring areas
  (resolving/AreaResolver.scala:26-40; predicate graphing/EntitiesToGraph.scala:8-14);
- relation outlines: expansion-filtered relations → outer ways → stitched
  rings (operators/relations.py + operators/rings.py);
- node resolution: the classic OSM "resolve geometry" shuffle — explode the
  node-id sequence with its position, equi-join the nodes table, reassemble
  ordered coordinate arrays with sort_array(collect_list(struct(pos,lat,lon)))
  (replacing MapDB lookups, resolving/NodeResolver.scala:18-50);
- ring cleanup: drop consecutive duplicate joints + the closing vertex
  (open-ring convention; the reference keeps duplicates, which are
  area/PIP-neutral — we normalize for exact hashing);
- dedup: canonical-ring hash groupBy replaces the reference's O(n·w)
  equal-area + mutual-containment linear scan
  (RenderAndDeduplicateAreas.scala:82-101) — merged areas union their osm_ids.

Everything except the per-ring canonical hash is built-in columnar ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geometry import bbox_col, normalize_ring, shoelace_area_col
from ..sources.documents import has_name
from .relations import expansion_status, outer_way_ids
from .rings import stitch_rings


def way_outlines(ways: DataFrame) -> DataFrame:
    """(osm_id, ring_index, node_ids) for named closed ways."""
    return ways.filter(F.col("is_closed") & has_name(F.col("tags"))).select(
        F.concat(F.col("way_id").cast("string"), F.lit("W")).alias("osm_id"),
        F.lit(0).alias("ring_index"),
        F.col("node_ids"),
    )


def relation_rings(relations: DataFrame, ways: DataFrame) -> DataFrame:
    """Stitched rings of named, expandable relations:
    (osm_id, ring_index, way_ids signed, node_ids)."""
    named = relations.filter(has_name(F.col("tags")))
    ok = expansion_status(named).filter("is_expandable").select("rel_id")
    expandable = named.join(ok, "rel_id", "left_semi")
    outer = outer_way_ids(expandable)
    with_nodes = outer.join(
        ways.select("way_id", "node_ids"), "way_id", "inner"
    ).select("rel_id", "way_id", "pos", "node_ids")
    rings = stitch_rings(with_nodes)
    return rings.select(
        F.concat(F.col("rel_id").cast("string"), F.lit("R")).alias("osm_id"),
        F.col("ring_index"),
        F.col("way_ids"),
        F.col("node_ids"),
    )


def relation_outlines(relations: DataFrame, ways: DataFrame) -> DataFrame:
    """(osm_id, ring_index, node_ids) for named, expandable relations."""
    return relation_rings(relations, ways).select(
        "osm_id", "ring_index", "node_ids")


def _clean_ring_pts(pts):
    """Open-ring cleanup on an array<struct(lat,lon)> column: drop
    consecutive duplicate joints, then the explicit closing vertex."""
    # consecutive-duplicate removal (1-based element_at(pts, i) = predecessor)
    deduped = F.filter(
        pts, lambda x, i: (i == F.lit(0)) | (x != F.element_at(pts, i))
    )
    # drop closing vertex if ring is explicitly closed
    return F.when(
        (F.size(deduped) > 1)
        & (F.element_at(deduped, 1) == F.element_at(deduped, -1)),
        F.slice(deduped, 1, F.size(deduped) - 1),
    ).otherwise(deduped)


def resolve_outline_points(outlines: DataFrame, nodes: DataFrame) -> DataFrame:
    """Join node coordinates and reassemble ordered, cleaned rings.

    Output: (osm_id, ring_index, lats, lons, n_points) with consecutive
    duplicates and the closing vertex removed (open-ring convention).
    """
    exploded = outlines.select(
        "osm_id", "ring_index", F.posexplode("node_ids").alias("seq", "node_id")
    )
    joined = exploded.join(nodes.select("node_id", "lat", "lon"), "node_id")
    assembled = joined.groupBy("osm_id", "ring_index").agg(
        F.array_sort(
            F.collect_list(F.struct("seq", "lat", "lon"))
        ).alias("pts_raw")
    )
    pts = F.transform(
        F.col("pts_raw"), lambda s: F.struct(s["lat"].alias("lat"), s["lon"].alias("lon"))
    )
    opened = _clean_ring_pts(pts)
    return assembled.select(
        "osm_id",
        "ring_index",
        F.transform(opened, lambda s: s["lat"]).alias("lats"),
        F.transform(opened, lambda s: s["lon"]).alias("lons"),
    ).withColumn("n_points", F.size("lats"))


def outline_way_refs(ways: DataFrame, relations: DataFrame) -> DataFrame:
    """(osm_id, ring_index, way_ids signed) — OutputResolvedArea analog
    (reference outputresolvedarea 'ways' field, steps/ExtractAreas.scala:55):
    each area outline as its ordered signed way-id list (negative =
    traversed reversed). Closed named ways are their own single-way ring."""
    w = ways.filter(F.col("is_closed") & has_name(F.col("tags"))).select(
        F.concat(F.col("way_id").cast("string"), F.lit("W")).alias("osm_id"),
        F.lit(0).alias("ring_index"),
        F.array(F.col("way_id")).alias("way_ids"),
    )
    r = relation_rings(relations, ways).select(
        "osm_id", "ring_index", "way_ids")
    return w.unionByName(r)


def used_way_ids(outline_refs: DataFrame) -> DataFrame:
    """(way_id) — distinct |way ids| referenced by any area outline: the
    reference's waysUsed accumulation (steps/ExtractAreas.scala:49-56)."""
    return (
        outline_refs.select(F.explode("way_ids").alias("signed"))
        .select(F.abs(F.col("signed")).alias("way_id"))
        .distinct()
    )


def way_points(ways: DataFrame, nodes: DataFrame,
               used: DataFrame | None = None) -> DataFrame:
    """(way_id, lats, lons) — the OutputWay table (outputway.proto:3-6,
    written by steps/ExtractAreas, read back by
    RenderAndDeduplicateAreas.scala:27-36): per-way resolved coordinate
    arrays, optionally pruned to area-referenced ways (the reference only
    dumps waysUsed)."""
    w = ways
    if used is not None:
        w = w.join(used, "way_id", "left_semi")
    exploded = w.select(
        "way_id", F.posexplode("node_ids").alias("seq", "node_id"))
    joined = exploded.join(nodes.select("node_id", "lat", "lon"), "node_id")
    return joined.groupBy("way_id").agg(
        F.array_sort(F.collect_list(F.struct("seq", "lat", "lon"))).alias("p")
    ).select(
        "way_id",
        F.transform("p", lambda s: s["lat"]).alias("lats"),
        F.transform("p", lambda s: s["lon"]).alias("lons"),
    )


def reassemble_outline_points(outline_refs: DataFrame,
                              wpoints: DataFrame) -> DataFrame:
    """Signed-way outline reassembly — the reference's area render path
    (RenderAndDeduplicateAreas.scala:41-56): abs(way id) looks up the way's
    point list, negative ids reverse it, segments concatenate in ref order.
    Output schema equals resolve_outline_points (osm_id, ring_index, lats,
    lons, n_points); tests assert row-for-row equality on the ring worlds."""
    ex = outline_refs.select(
        "osm_id", "ring_index",
        F.posexplode("way_ids").alias("pos", "signed"),
    ).withColumn("way_id", F.abs(F.col("signed")))
    j = ex.join(wpoints, "way_id").select(
        "osm_id", "ring_index", "pos",
        F.when(F.col("signed") < 0, F.reverse("lats"))
        .otherwise(F.col("lats")).alias("seg_lats"),
        F.when(F.col("signed") < 0, F.reverse("lons"))
        .otherwise(F.col("lons")).alias("seg_lons"),
    )
    assembled = j.groupBy("osm_id", "ring_index").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "seg_lats", "seg_lons"))
        ).alias("segs")
    )
    lats = F.flatten(F.transform("segs", lambda s: s["seg_lats"]))
    lons = F.flatten(F.transform("segs", lambda s: s["seg_lons"]))
    pts = F.zip_with(
        lats, lons,
        lambda la, lo: F.struct(la.alias("lat"), lo.alias("lon")))
    opened = _clean_ring_pts(pts)
    return assembled.select(
        "osm_id",
        "ring_index",
        F.transform(opened, lambda s: s["lat"]).alias("lats"),
        F.transform(opened, lambda s: s["lon"]).alias("lons"),
    ).withColumn("n_points", F.size("lats"))


def area_tags(tags: DataFrame, areas: DataFrame) -> DataFrame:
    """Tags pruned to osm-ids referenced by any area — the reference's
    dedicated tags stage (steps/ExtractAreaTags.scala:23-25 isUsed set).
    At planet scale this is the difference between carrying every tagged
    entity's tags and only the area-referenced ones. The explode side is
    areas-sized (small); the semi-join prunes the corpus-sized tags scan."""
    used = areas.select(F.explode("osm_ids").alias("osm_id")).distinct()
    return tags.join(used, "osm_id", "left_semi")


def with_area_and_bbox(rings: DataFrame) -> DataFrame:
    """Planar shoelace area (reference areaOf semantics) + bbox struct."""
    return rings.withColumn(
        "area", shoelace_area_col(F.col("lats"), F.col("lons"))
    ).withColumn("bbox", bbox_col(F.col("lats"), F.col("lons")))


@F.pandas_udf(T.StringType())
def _ring_hash(lats: pd.Series, lons: pd.Series) -> pd.Series:
    """Canonical ring hash: rotation- and direction-invariant md5."""
    out = []
    for la, lo in zip(lats, lons):
        ys, xs = normalize_ring(np.asarray(la), np.asarray(lo))
        h = hashlib.md5()
        h.update(np.round(ys, 9).tobytes())
        h.update(np.round(xs, 9).tobytes())
        out.append(h.hexdigest())
    return pd.Series(out)


def dedup_areas(areas: DataFrame) -> DataFrame:
    """Merge areas with identical canonical rings; union + sort osm_ids.

    Output: (canonical_osm_id, osm_ids, lats, lons, n_points, area, bbox).
    Exact-equality grouping replaces the reference's equal-area +
    mutual-containment scan; the canonical id (min osm_id) replaces its
    disposable AtomicLong ids (model/AreaIdSequence.scala:5-12 — 'not likely
    to remain the same over time', root README.md:127).
    """
    hashed = areas.withColumn("ring_hash", _ring_hash("lats", "lons"))
    return hashed.groupBy("ring_hash").agg(
        F.array_sort(F.array_distinct(F.collect_list("osm_id"))).alias("osm_ids"),
        F.min("osm_id").alias("canonical_osm_id"),
        F.min_by(F.struct("lats", "lons", "n_points", "area", "bbox"), "osm_id").alias("g"),
    ).select(
        "canonical_osm_id",
        "osm_ids",
        F.col("g.lats").alias("lats"),
        F.col("g.lons").alias("lons"),
        F.col("g.n_points").alias("n_points"),
        F.col("g.area").alias("area"),
        F.col("g.bbox").alias("bbox"),
        "ring_hash",
    )


def build_areas(nodes: DataFrame, ways: DataFrame, relations: DataFrame,
                has_relations: bool | None = None) -> DataFrame:
    """Full areas table from decoded entities (pre-graph).

    NOTE: duplicate (osm_id, ring_index) pairs cannot collide across ways and
    relations (suffix W/R disambiguates); multi-ring relations yield one area
    per ring sharing the relation's osm_id (reference AreaResolver emits one
    ResolvedArea per outline ring).

    has_relations: caller hint for skipping the relation sub-plan (iterative
    expansion + grouped stitching ≈ 10 stages) on relation-free inputs.
    None (default) keeps plan construction fully lazy and includes the
    branch; pass False only when the input is known relation-free (e.g. the
    synthetic bench corpus) — an eager isEmpty() probe here would launch a
    Spark job on every pipeline build (ADVICE r1)."""
    outlines = way_outlines(ways)
    if has_relations is not False:
        outlines = outlines.unionByName(relation_outlines(relations, ways))
    rings = resolve_outline_points(outlines, nodes)
    rings = rings.filter(F.col("n_points") >= 3)
    return dedup_areas(with_area_and_bbox(rings))
