"""Candidate-edge kNN search (reference J2 — the ``map_snap`` candidate
lookup Valhalla performs internally; /root/reference/conflation/map_matching/valhalla.py:141
delegates it via ``shape_match=map_snap``).

Strategy (scale-first):
- edges exploded to covering cells (J1, tiling.edge_covering_cells) — the
  per-cell edge index. For a continental graph this is still tiny relative
  to trace volume, so the join side is broadcast when it fits
  (spark.sql.autoBroadcastJoinThreshold); otherwise it becomes a shuffled
  equi-join on ``cell`` where AQE's skew-join splits hot urban cells.
- points get their cell (F14 math) and equi-join on ``cell`` — never a
  cross-join; the cell grid bounds the candidate fan-out.
- point-to-segment distance is pure column arithmetic (equirectangular
  projection in meters around the point latitude — exact enough at <100 m
  scales), so the whole search stays in whole-stage codegen.
- top-k per point via row_number over (doc_id, offset) ordered by distance
  with deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conflation_spark.operators.tiling import (
    DEFAULT_ZOOM,
    edge_covering_cells,
    with_point_cell,
)

DEG_LAT_M = 111320.0  # meters per degree latitude (spherical approx)
DEFAULT_K = 4
DEFAULT_RADIUS_M = 35.0


def candidate_edges(
    points: DataFrame,
    edges: DataFrame,
    zoom: int = DEFAULT_ZOOM,
    k: int = DEFAULT_K,
    radius_m: float = DEFAULT_RADIUS_M,
    broadcast_edges: bool = True,
) -> DataFrame:
    """points(doc_id, offset, time, lon, lat) x edges(edge_id, src, dst,
    lon1, lat1, lon2, lat2, ...) -> up to k candidates per point:

    (doc_id, offset, time, lon, lat, edge_id, src, dst, dist_m, t_param,
     len_m, cand_rank)

    ``t_param`` is the clamped projection parameter along the edge (0..1,
    from the edge's (lon1,lat1) endpoint) — the Viterbi stage uses it for
    along-edge route distances.
    """
    pc = with_point_cell(points.select("doc_id", "offset", "time", "lon", "lat"), zoom)
    ec = edge_covering_cells(
        edges.select("edge_id", "src", "dst", "lon1", "lat1", "lon2", "lat2"),
        zoom,
        buffer_m=radius_m + 5.0,
    )
    right = F.broadcast(ec) if broadcast_edges else ec
    j = pc.join(right, "cell")

    # equirectangular meters around the point's latitude
    coslat = F.cos(F.radians(F.col("lat")))
    ax = (F.col("lon1") - F.col("lon")) * coslat * DEG_LAT_M
    ay = (F.col("lat1") - F.col("lat")) * DEG_LAT_M
    bx = (F.col("lon2") - F.col("lon")) * coslat * DEG_LAT_M
    by = (F.col("lat2") - F.col("lat")) * DEG_LAT_M
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t_raw = F.when(len2 > 0, -(ax * dx + ay * dy) / len2).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    dist = F.sqrt(cx * cx + cy * cy)

    cand = (
        j.withColumn("t_param", t)
        .withColumn("dist_m", dist)
        .withColumn("len_m", F.sqrt(len2))
        .where(F.col("dist_m") <= radius_m)
    )
    w = Window.partitionBy("doc_id", "offset").orderBy(
        F.col("dist_m").asc(), F.col("edge_id").asc()
    )
    return (
        cand.withColumn("cand_rank", F.row_number().over(w))
        .where(F.col("cand_rank") <= k)
        .select(
            "doc_id",
            "offset",
            "time",
            "lon",
            "lat",
            "edge_id",
            "src",
            "dst",
            "dist_m",
            "t_param",
            "len_m",
            "cand_rank",
        )
    )
