"""Tile/cell arithmetic (reference F13-F15, S2-S3) — all built-in column math.

Slippy-tile encode/decode per the reference
(/root/reference/conflation/trace_fetching/mapillary.py:755-781), with the
same clamps (lat ±85.0511, lon ±179.9999). No UDFs: ``F.asinh``/``F.tan``
are JVM-side, so cell assignment stays inside whole-stage codegen.

Cells are packed into one long ``cell = x * 2^z + y`` so a single column
drives repartitioning, joins, and pruning (analog of the reference's z5
routable-tile whitelist, mapillary.py:561-563 — an ``isin`` against a
broadcast set / partition filter).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_LAT = 85.0511  # mapillary.py:758-763
MAX_LON = 179.9999
DEFAULT_ZOOM = 16


def _clamp(c: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def tile_x(lon: Column, zoom: int) -> Column:
    lon = _clamp(lon, -MAX_LON, MAX_LON)
    return F.floor((lon + 180.0) / 360.0 * (1 << zoom)).cast("long")


def tile_y(lat: Column, zoom: int) -> Column:
    lat = _clamp(lat, -MAX_LAT, MAX_LAT)
    rad = F.radians(lat)
    return F.floor((1.0 - F.asinh(F.tan(rad)) / math.pi) / 2.0 * (1 << zoom)).cast("long")


def pack_cell(x: Column, y: Column, zoom: int) -> Column:
    return (x * F.lit(1 << zoom) + y).cast("long")


def cell_of(lon: Column, lat: Column, zoom: int = DEFAULT_ZOOM) -> Column:
    return pack_cell(tile_x(lon, zoom), tile_y(lat, zoom), zoom)


def tile_nw_lon(x: Column, zoom: int) -> Column:
    """NW-corner lon of tile x (inverse of tile_x, mapillary.py:773-781)."""
    return x.cast("double") / F.lit(float(1 << zoom)) * 360.0 - 180.0


def tile_nw_lat(y: Column, zoom: int) -> Column:
    """NW-corner lat of tile y (inverse of tile_y, mapillary.py:773-781)."""
    inner = F.lit(math.pi) * (1.0 - 2.0 * y.cast("double") / F.lit(float(1 << zoom)))
    return F.degrees(F.atan(F.sinh(inner)))


def with_point_cell(points: DataFrame, zoom: int = DEFAULT_ZOOM) -> DataFrame:
    return points.withColumn("cell", cell_of(F.col("lon"), F.col("lat"), zoom))


def edge_covering_cells(
    edges: DataFrame, zoom: int = DEFAULT_ZOOM, buffer_m: float = 40.0
) -> DataFrame:
    """J1: explode each edge to every cell its buffered bbox covers.

    The buffer (meters -> degrees, latitude-aware for lon) guarantees a point
    within ``buffer_m`` of the edge lands in a covered cell, so the
    point-cell equi-join finds all candidates within the search radius
    without a neighbor-ring expansion. Straight ~200 m edges at z16 cover
    1-4 cells, so the explode is tiny (built-in ``sequence`` x ``explode``).
    """
    blat = buffer_m / 111320.0
    lat_max_abs = F.greatest(F.abs(F.col("lat1")), F.abs(F.col("lat2")))
    blon = F.lit(buffer_m) / (F.lit(111320.0) * F.cos(F.radians(_clamp(lat_max_abs, 0.0, 85.0))))
    lo_lon = F.least("lon1", "lon2") - blon
    hi_lon = F.greatest("lon1", "lon2") + blon
    lo_lat = F.least("lat1", "lat2") - F.lit(blat)
    hi_lat = F.greatest("lat1", "lat2") + F.lit(blat)
    x0, x1 = tile_x(lo_lon, zoom), tile_x(hi_lon, zoom)
    # note: y grows south, so hi_lat -> smaller y
    y0, y1 = tile_y(hi_lat, zoom), tile_y(lo_lat, zoom)
    return (
        edges.withColumn("xs", F.sequence(x0, x1))
        .withColumn("ys", F.sequence(y0, y1))
        .withColumn("x", F.explode("xs"))
        .withColumn("y", F.explode("ys"))
        .withColumn("cell", pack_cell(F.col("x"), F.col("y"), zoom))
        .drop("xs", "ys", "x", "y")
    )


def prune_to_cells(df: DataFrame, cells: DataFrame) -> DataFrame:
    """S3 analog: keep rows whose cell appears in the (small, broadcast)
    active-cell set — static partition pruning for dead tiles."""
    return df.join(F.broadcast(cells.select("cell").distinct()), "cell", "left_semi")


def bbox_overlaps(
    alo_lon: Column, alo_lat: Column, ahi_lon: Column, ahi_lat: Column,
    blo_lon: Column, blo_lat: Column, bhi_lon: Column, bhi_lat: Column,
) -> Column:
    """F13 rectangle intersection — touching edges do NOT overlap
    (strict inequalities, mapillary.py:731-745)."""
    return ~(
        (ahi_lon <= blo_lon)
        | (bhi_lon <= alo_lon)
        | (ahi_lat <= blo_lat)
        | (bhi_lat <= alo_lat)
    )


def point_in_bbox(lon: Column, lat: Column, lo_lon, lo_lat, hi_lon, hi_lat) -> Column:
    """F12 half-open containment: lo <= v < hi (mapillary.py:748-752) —
    tile-boundary points belong to exactly one owner."""
    return (lon >= lo_lon) & (lon < hi_lon) & (lat >= lo_lat) & (lat < hi_lat)


def point_in_polygon_const(
    lon: Column, lat: Column, ring: "list[tuple[float, float]]"
) -> Column:
    """Ray-casting point-in-polygon for a ring KNOWN AT PLAN TIME — the
    common case (filter by a fixed geofence). The ring unrolls into plain
    codegen'd boolean terms (one per edge, summed, mod 2), which
    whole-stage-codegen compiles; the array/HOF variant below evaluates
    its lambdas in the INTERPRETED expression path per row (CLAUDE.md
    rule 3) — ~5x slower on a multi-million-point scan. Identical
    even-odd semantics and IEEE expression tree per edge.
    """
    pts = list(ring)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    crossings = None
    for (alo, ala), (blo, bla) in zip(pts, pts[1:] + pts[:1]):
        cond = ((F.lit(ala) > lat) != (F.lit(bla) > lat)) & (
            lon
            < (F.lit(blo) - F.lit(alo))
            * (lat - F.lit(ala))
            / (F.lit(bla) - F.lit(ala))
            + F.lit(alo)
        )
        term = F.when(cond, 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return F.pmod(crossings, F.lit(2)) == 1


def point_in_polygon(lon: Column, lat: Column, polygon: Column) -> Column:
    """Ray-casting point-in-polygon, pure array expressions (JVM-side).

    ``polygon``: array<struct<lon:double, lat:double>> (closed or open ring;
    the closing edge is added automatically). Standard even-odd rule: count
    edges crossing the horizontal ray to +inf; odd => inside. Points exactly
    on edges follow the half-open convention of the crossing test.

    NOTE: zip_with/aggregate lambdas run INTERPRETED (CLAUDE.md rule 3) —
    this variant is for rings that genuinely vary per row (a polygon
    column); for a fixed geofence use ``point_in_polygon_const``.
    """
    n = F.size(polygon)
    ring_a = polygon
    ring_b = F.concat(F.slice(polygon, 2, n - 1), F.slice(polygon, 1, 1))
    crossings = F.aggregate(
        F.zip_with(
            ring_a,
            ring_b,
            lambda a, b: F.when(
                ((a["lat"] > lat) != (b["lat"] > lat))
                & (
                    lon
                    < (b["lon"] - a["lon"]) * (lat - a["lat"]) / (b["lat"] - a["lat"])
                    + a["lon"]
                ),
                1,
            ).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.pmod(crossings, F.lit(2)) == 1


def rasterize_points(points: DataFrame, zoom: int = DEFAULT_ZOOM) -> DataFrame:
    """Vector -> raster: aggregate points into the tile grid
    (cell, x, y, n_points) — a density raster at the given zoom."""
    p = points.select(
        tile_x(F.col("lon"), zoom).alias("x"), tile_y(F.col("lat"), zoom).alias("y")
    )
    return (
        p.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .withColumn("cell", pack_cell(F.col("x"), F.col("y"), zoom))
        .select("cell", "x", "y", "n_points")
    )


def vectorize_cells(raster: DataFrame, zoom: int = DEFAULT_ZOOM) -> DataFrame:
    """Raster -> vector: cells back to their bounding-box polygons
    (closed rings, NW/NE/SE/SW), e.g. for exporting heatmap tiles."""
    w_lon = tile_nw_lon(F.col("x"), zoom)
    e_lon = tile_nw_lon(F.col("x") + 1, zoom)
    n_lat = tile_nw_lat(F.col("y"), zoom)
    s_lat = tile_nw_lat(F.col("y") + 1, zoom)
    pt = lambda lo, la: F.struct(lo.alias("lon"), la.alias("lat"))  # noqa: E731
    return raster.withColumn(
        "polygon",
        F.array(pt(w_lon, n_lat), pt(e_lon, n_lat), pt(e_lon, s_lat), pt(w_lon, s_lat)),
    )


def raster_to_runs(raster: DataFrame, zoom: int = DEFAULT_ZOOM) -> DataFrame:
    """Raster -> vector, run-length form: merge horizontally adjacent cells
    of each raster row into strips and emit their geographic bounding boxes
    (y, x_start, x_end, n_cells, n_points, w_lon, e_lon, n_lat, s_lat).

    One window pass (lag over x within y) + one aggregation — the classic
    run-length vectorization, entirely in SQL window functions. Strips are
    the building block for polygonization/dissolve passes downstream.
    """
    w = Window.partitionBy("y").orderBy("x")
    runs = (
        raster.withColumn("_px", F.lag("x").over(w))
        .withColumn("_new", F.when(F.col("_px").isNull() | (F.col("x") != F.col("_px") + 1), 1).otherwise(0))
        .withColumn("run", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    agg = runs.groupBy("y", "run").agg(
        F.min("x").alias("x_start"),
        F.max("x").alias("x_end"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_points").alias("n_points"),
    )
    return agg.select(
        "y",
        "x_start",
        "x_end",
        "n_cells",
        "n_points",
        tile_nw_lon(F.col("x_start"), zoom).alias("w_lon"),
        tile_nw_lon(F.col("x_end") + 1, zoom).alias("e_lon"),
        tile_nw_lat(F.col("y"), zoom).alias("n_lat"),
        tile_nw_lat(F.col("y") + 1, zoom).alias("s_lat"),
    )


def _spread_bits16(v: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of a 32-bit word
    (the classic Morton magic-mask ladder) — pure shift/mask column ops,
    whole-stage-codegen'd, identical operator set in DuckDB (`<<`, `|`,
    `&` on BIGINT), so the z key is oracle-comparable."""
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
    return v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))


def zorder_key(x: Column, y: Column, zoom: int) -> Column:
    """Z-order (Morton) interleave of tile coordinates: bit i of x lands at
    position 2i, bit i of y at 2i+1. Nearby tiles get nearby keys, so
    sorting the WRITE by z clusters spatial neighbors into the same
    parquet row groups — their lon/lat min/max statistics become tight and
    a bbox scan prunes most row groups without reading them (measured in
    tests/test_tiling.py). This is the data-layout half of the 100-TB
    geospatial story; the query-side half (predicate pushdown to the
    scan) is audited separately. Supports zoom <= 16 (z fits in 32 bits)."""
    if zoom > 16:
        raise ValueError(f"zorder_key supports zoom <= 16, got {zoom}")
    return _spread_bits16(x).bitwiseOR(
        F.shiftleft(_spread_bits16(y), 1)
    ).cast("long")


def zorder_of(lon: Column, lat: Column, zoom: int = DEFAULT_ZOOM) -> Column:
    return zorder_key(tile_x(lon, zoom), tile_y(lat, zoom), zoom)


def zorder_decode(z: Column) -> tuple[Column, Column]:
    """Inverse interleave: z -> (tile_x, tile_y). The mask ladder run
    backwards; used by the round-trip test."""

    def compact(v: Column) -> Column:
        v = v.bitwiseAND(F.lit(0x55555555))
        v = v.bitwiseOR(F.shiftright(v, 1)).bitwiseAND(F.lit(0x33333333))
        v = v.bitwiseOR(F.shiftright(v, 2)).bitwiseAND(F.lit(0x0F0F0F0F))
        v = v.bitwiseOR(F.shiftright(v, 4)).bitwiseAND(F.lit(0x00FF00FF))
        return v.bitwiseOR(F.shiftright(v, 8)).bitwiseAND(F.lit(0x0000FFFF))

    return compact(z), compact(F.shiftright(z, 1))


def zorder_clustered(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = DEFAULT_ZOOM,
    z_col: str = "z",
) -> DataFrame:
    """Arrange rows for a spatially-clustered write: range-repartition on
    the z key (files cover disjoint z ranges -> file-level skipping) and
    sort within partitions (row-group-level skipping). Callers write the
    result with a modest parquet row-group size; drop ``z_col`` afterwards
    if the key itself isn't wanted."""
    out = df.withColumn(z_col, zorder_of(F.col(lon_col), F.col(lat_col), zoom))
    return out.repartitionByRange(z_col).sortWithinPartitions(z_col)


def cell_parent(cell: Column, zoom: int, parent_zoom: int) -> Column:
    """Hierarchical cell rollup (H3-style parent): the packed cell id of the
    ancestor tile at a coarser zoom. Pure bit/offset arithmetic — lets
    per-cell aggregates roll up zoom levels without touching lon/lat again
    (e.g. z16 candidate cells -> z5 routable-prune cells)."""
    dz = zoom - parent_zoom
    if dz < 0:
        raise ValueError("parent_zoom must be <= zoom")
    x = F.floor(cell / F.lit(1 << zoom))
    y = cell - x * F.lit(1 << zoom)
    px = F.floor(x / F.lit(1 << dz))
    py = F.floor(y / F.lit(1 << dz))
    return (px * F.lit(1 << parent_zoom) + py).cast("long")
