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
    rank: bool = False,
    hot_cell_threshold: int = 100_000,
    range_partition: int | None = None,
) -> DataFrame:
    """points(doc_id, offset, time, lon, lat) x edges(edge_id, src, dst,
    lon1, lat1, lon2, lat2, ...) -> up to k candidates per point:

    (doc_id, offset, time, lon, lat, edge_id, src, dst, dist_m, t_param,
     len_m, cand_rank)

    ``t_param`` is the clamped projection parameter along the edge (0..1,
    from the edge's (lon1,lat1) endpoint) — the Viterbi stage uses it for
    along-edge route distances.
    """
    # gps_idx (dense per-doc point index from filter_traces) rides along so
    # the matcher can run off candidates alone (missing points = idx gaps);
    # gc_prev (precomputed adjacent-pair great-circle) replaces lon/lat in
    # the matcher's transition model
    extra = [c for c in ("gps_idx", "gc_prev") if c in points.columns]
    pc = with_point_cell(points.select("doc_id", "offset", "time", "lon", "lat", *extra), zoom)
    if range_partition:
        # continental-scale locality knob (north_star: explicit
        # repartitionByRange on cells before the trace-to-edge join):
        # range-partitioning keeps geographically neighboring cells in the
        # same partition, so the shuffled cell join and any downstream
        # per-tile pass read contiguous tile ranges instead of hashing the
        # planet across every partition.
        pc = pc.repartitionByRange(range_partition, "cell")
    ec = edge_covering_cells(
        edges.select("edge_id", "src", "dst", "lon1", "lat1", "lon2", "lat2"),
        zoom,
        buffer_m=radius_m + 5.0,
    )
    # Precompute the edge's meter-space frame on the (small) broadcast side:
    # all trig happens once per edge-cell row, and the per-joined-row math
    # shrinks to a handful of mul/adds. (Catalyst pushes the radius filter
    # into the join condition without CSE — a naive formulation re-evaluates
    # a trig-heavy tree dozens of times per row; this one stays cheap even
    # fully inlined.)
    coslat = F.cos(F.radians((F.col("lat1") + F.col("lat2")) / 2.0))
    ec = (
        ec.withColumn("coslat", coslat)
        .withColumn("ex", (F.col("lon2") - F.col("lon1")) * F.col("coslat") * DEG_LAT_M)
        .withColumn("ey", (F.col("lat2") - F.col("lat1")) * F.lit(DEG_LAT_M))
        .withColumn("len2", F.col("ex") * F.col("ex") + F.col("ey") * F.col("ey"))
        .withColumn("len_m", F.sqrt("len2"))
    )
    if broadcast_edges:
        j = pc.join(F.broadcast(ec), "cell")
    else:
        # continental-scale path: shuffled cell join with hot-cell salting
        # (urban-core skew) on top of AQE skew-join
        from conflation_spark.operators.skew import salted_cell_join

        j = salted_cell_join(pc, ec, n_salts=8, hot_threshold=hot_cell_threshold)

    px = (F.col("lon") - F.col("lon1")) * F.col("coslat") * DEG_LAT_M
    py = (F.col("lat") - F.col("lat1")) * F.lit(DEG_LAT_M)
    t_raw = F.when(F.col("len2") > 0, (px * F.col("ex") + py * F.col("ey")) / F.col("len2"))
    t = F.least(F.greatest(t_raw.otherwise(F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
    dx = px - t * F.col("ex")
    dy = py - t * F.col("ey")
    dist = F.sqrt(dx * dx + dy * dy)

    cand = (
        j.withColumn("t_param", t)
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= radius_m)
        .select(
            "doc_id", "offset", "time", "lon", "lat", *extra,
            "edge_id", "src", "dst", "dist_m", "t_param", "len_m",
        )
    )
    if not rank:
        # top-k happens inside the matcher's per-doc numpy pass, saving a
        # full shuffle of the largest intermediate (the matcher shuffles by
        # doc_id anyway). This is the default pipeline path.
        return cand
    w = Window.partitionBy("doc_id", "offset").orderBy(
        F.col("dist_m").asc(), F.col("edge_id").asc()
    )
    return (
        cand.withColumn("cand_rank", F.row_number().over(w))
        .where(F.col("cand_rank") <= k)
        .drop("cand_rank")
    )
