"""Scan-side filters and caps (reference S4/F10/F11/Q5).

These run before the expensive match stage, mirroring the reference's
fetch-time behavior:

- recency filter (F11): only sequences whose capture time is recent
  (reference: coverage-tile + API predicates,
  /root/reference/conflation/trace_fetching/mapillary.py:19-21,86-96,402) —
  expressed on the FIRST gps span so Catalyst pushes the span struct access
  into the scan and whole docs drop early.
- min-image-count filter (F10): >= k gps points per doc
  (mapillary.py:22-24,441-445).
- per-cell sequence cap (Q5): at most ``max_per_cell`` sequences per tile
  cell, deterministic by doc_id order (the reference caps at 500 sequences
  per z14 tile, mapillary.py:16-18,364-412; its order is API-arrival —
  ours is fixed to doc_id so reruns and the SQL oracle agree). A doc is
  assigned to its FIRST point's cell (the v3 owner-cell rule,
  mapillary_v3.py:219-227, preventing double-processing across cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conflation_spark.operators.tiling import DEFAULT_ZOOM, cell_of


def recency_filter(points: DataFrame, min_time: float) -> DataFrame:
    """Keep docs whose FIRST point (min offset) is at/after min_time."""
    first = points.groupBy("doc_id").agg(F.min_by("time", "offset").alias("t0"))
    keep = first.where(F.col("t0") >= min_time).select("doc_id")
    return points.join(keep, "doc_id", "left_semi")


def min_points_filter(points: DataFrame, min_points: int = 30) -> DataFrame:
    keep = (
        points.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_points)
        .select("doc_id")
    )
    return points.join(keep, "doc_id", "left_semi")


def doc_owner_cells(points: DataFrame, zoom: int = DEFAULT_ZOOM) -> DataFrame:
    """(doc_id, owner_cell): the cell of the doc's first point."""
    first = points.groupBy("doc_id").agg(
        F.min_by("lon", "offset").alias("lon0"), F.min_by("lat", "offset").alias("lat0")
    )
    return first.select(
        "doc_id", cell_of(F.col("lon0"), F.col("lat0"), zoom).alias("owner_cell")
    )


def cap_sequences_per_cell(
    points: DataFrame, max_per_cell: int = 500, zoom: int = DEFAULT_ZOOM
) -> DataFrame:
    """Keep at most max_per_cell docs per owner cell (deterministic by
    doc_id). Returns the surviving points."""
    owners = doc_owner_cells(points, zoom)
    w = Window.partitionBy("owner_cell").orderBy("doc_id")
    keep = (
        owners.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_per_cell)
        .select("doc_id")
    )
    return points.join(keep, "doc_id", "left_semi")
