"""JSON output surface (S9) — the API layer's Play-JSON rendering
(osm-jigsaw-api/app/controllers/Application.scala:126-135 renderNode,
OutputNode/OutputEntity shapes) as columnar `to_json` expressions plus a
partitioned JSON-lines sink.

Spark-first: rendering is a projection (`to_json(struct(...))`) that stays
in codegen and distributes with the data; the sink is `df.write.json`
(one file per partition — the cluster-parallel analog of the API's
per-request serialization)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink, one file per partition."""
    df.write.mode(mode).json(path)


def _name_expr(tags: Column, fallback: Column) -> Column:
    """nameForOsmId fallback chain (EntityRendering.scala:15-23):
    name:en, name, addr:housename, else the area id."""
    return F.coalesce(
        F.element_at(tags, "name:en"),
        F.element_at(tags, "name"),
        F.element_at(tags, "addr:housename"),
        fallback,
    )


def render_nodes(areas: DataFrame, edges: DataFrame,
                 tags: DataFrame) -> DataFrame:
    """(area_key, json) — OutputNode analog per area:
    {"id": ..., "entities": [{"osmId", "name"}...], "children": n, "area": a}.

    children = outgoing containment edges (renderNode's node.children.size);
    entity names resolve through the tags lookup with the area id fallback.
    """
    children = edges.groupBy(F.col("parent_key").alias("area_key")).agg(
        F.count("*").alias("n_children"))
    ent = (
        areas.select(
            F.col("ring_hash").alias("area_key"), "canonical_osm_id",
            "area", F.explode("osm_ids").alias("osm_id"))
        .join(tags, "osm_id", "left")
        .select(
            "area_key", "canonical_osm_id", "area",
            F.struct(
                F.col("osm_id").alias("osmId"),
                _name_expr(F.col("tags"), F.col("canonical_osm_id"))
                .alias("name"),
            ).alias("entity"),
        )
        .groupBy("area_key", "canonical_osm_id", "area")
        .agg(F.sort_array(F.collect_list("entity")).alias("entities"))
    )
    return (
        ent.join(children, "area_key", "left")
        .select(
            "area_key",
            F.to_json(F.struct(
                F.col("canonical_osm_id").alias("id"),
                F.col("entities"),
                F.coalesce("n_children", F.lit(0)).alias("children"),
                F.round("area", 9).alias("area"),
            )).alias("json"),
        )
    )


def render_paths(geocode_paths: DataFrame) -> DataFrame:
    """(point_id, json) — the geocode response shape: the path as a JSON
    array of osm-id path components."""
    return geocode_paths.select(
        "point_id",
        F.to_json(F.struct(
            F.col("point_id").alias("point"),
            F.col("path").alias("nodes"),
        )).alias("json"),
    )
