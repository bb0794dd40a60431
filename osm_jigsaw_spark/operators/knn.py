"""kNN nearest-area lookup via grid-cell ring expansion.

Extension mandated by the north rule — NO reference analog (the closest
thing is the geohash-cell segment lookup, osm-jigsaw-api
app/graph/GraphService.scala:31-32). Documented as such in SURVEY.md §2.5.

Approach: candidate areas come from the shared covering index joined against
the query point's cell *neighborhood* (k-ring of radius `ring` at each
resolution — pure columnar sequence×sequence explode, same trick as bbox
coverings). Exact point→polygon distance (0 when inside) is an Arrow
kernel; per-point top-k is a window row_number. Points whose k-ring finds
fewer than k candidates report what was found — widen `ring` to trade
shuffle volume for recall (at planet density res-3 cells hold hundreds of
areas, so radius 1-2 suffices).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells as C
from ..functions.geometry import points_ring_distance_batch
from .containment import area_cell_index


def _kring_cells(lat, lon, ring: int):
    """array<long> of packed cells within `ring` grid steps of the point, at
    every resolution. Clamped at grid borders (no wraparound — consistent
    with the reference's acknowledged 180th-meridian blind spot)."""
    def ring_at(r):
        li, la = C.lon_idx(lon, r), C.lat_idx(lat, r)
        max_lon_i = (1 << C.lon_bits(r)) - 1
        max_lat_i = (1 << C.lat_bits(r)) - 1

        def over_lat(i):
            def cell(j):
                return (F.lit(r).cast("long") * F.lit(1 << 40)
                        + i * F.lit(1 << 20) + j)
            return F.transform(
                F.sequence(
                    F.greatest(F.lit(0), la - ring),
                    F.least(F.lit(max_lat_i), la + ring),
                ),
                cell,
            )

        return F.flatten(
            F.transform(
                F.sequence(
                    F.greatest(F.lit(0), li - ring),
                    F.least(F.lit(max_lon_i), li + ring),
                ),
                over_lat,
            )
        )

    return F.flatten(F.array(*[ring_at(r) for r in C.RESOLUTIONS]))


@F.pandas_udf(T.DoubleType())
def _point_ring_distance(area_key: pd.Series, lat: pd.Series, lon: pd.Series,
                         lats: pd.Series, lons: pd.Series) -> pd.Series:
    """Planar distance point→polygon boundary; 0 if inside-or-on.
    Grouped by ring: all candidate points of one area in a batch are
    decided by ONE points_ring_distance_batch sweep."""
    out = np.empty(len(area_key), dtype=np.float64)
    positions = pd.Series(range(len(area_key))).groupby(
        area_key.to_numpy()).indices
    py = lat.to_numpy(np.float64)
    px = lon.to_numpy(np.float64)
    for pos in positions.values():
        first = pos[0]
        out[pos] = points_ring_distance_batch(
            py[pos], px[pos],
            np.asarray(lats.iloc[first]), np.asarray(lons.iloc[first]),
        )
    return pd.Series(out)


def knn_areas(areas: DataFrame, points: DataFrame, k: int = 5,
              ring: int = 1, idx: DataFrame | None = None) -> DataFrame:
    """(point_id, canonical_osm_id, distance, rank) — k nearest areas.
    `idx`: optional shared pre-materialized area_cell_index."""
    if idx is None:
        idx = area_cell_index(areas)
    pts = points.select(
        "point_id", "lat", "lon",
        F.explode(_kring_cells(F.col("lat"), F.col("lon"), ring)).alias("cell"),
    )
    cand = (
        pts.join(idx, "cell")
        .select("point_id", "lat", "lon", "area_key",
                "canonical_osm_id", "lats", "lons")
        .dropDuplicates(["point_id", "area_key"])
    )
    with_d = cand.sortWithinPartitions("area_key").withColumn(
        "distance",
        _point_ring_distance("area_key", "lat", "lon", "lats", "lons"),
    )
    w = Window.partitionBy("point_id").orderBy(
        F.col("distance"), F.col("canonical_osm_id"), F.col("area_key"))
    return (
        with_d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("point_id", "canonical_osm_id", "area_key", "distance", "rank")
    )
