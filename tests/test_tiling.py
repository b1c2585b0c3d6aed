"""Tile math: lon/lat <-> slippy round trips incl. clamps, bbox-overlap
strict inequalities, half-open point-in-bbox (FIXTURES.md §4)."""

import math

from pyspark.sql import functions as F

from conflation_spark.operators import tiling


def _tile_xy_py(lon, lat, z):
    lon = max(-tiling.MAX_LON, min(tiling.MAX_LON, lon))
    lat = max(-tiling.MAX_LAT, min(tiling.MAX_LAT, lat))
    x = int((lon + 180.0) / 360.0 * (1 << z))
    y = int((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * (1 << z))
    return x, y


def test_tile_encode_matches_python(spark):
    pts = [
        (0.0, 0.0), (10.0, 35.0), (-70.0, -20.0), (179.99999, 85.5),
        (-180.0, -86.0), (24.6, 42.0), (0.0001, -0.0001),
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for z in (5, 14, 16):
        got = df.select(
            tiling.tile_x(F.col("lon"), z).alias("x"),
            tiling.tile_y(F.col("lat"), z).alias("y"),
        ).collect()
        for (lon, lat), r in zip(pts, got):
            assert (r["x"], r["y"]) == _tile_xy_py(lon, lat, z), (lon, lat, z)


def test_tile_decode_inverse(spark):
    z = 14
    df = spark.createDataFrame([(x, y) for x in (0, 100, 9000) for y in (0, 50, 8000)],
                               "x long, y long")
    back = df.select(
        "x", "y",
        tiling.tile_nw_lon(F.col("x"), z).alias("lon"),
        tiling.tile_nw_lat(F.col("y"), z).alias("lat"),
    )
    rt = back.select(
        "x", "y",
        tiling.tile_x(F.col("lon") + 1e-9, z).alias("x2"),
        tiling.tile_y(F.col("lat") - 1e-9, z).alias("y2"),
    ).collect()
    for r in rt:
        assert r["x"] == r["x2"] and r["y"] == r["y2"]


def test_bbox_overlap_strict(spark):
    df = spark.range(1)
    # touching edges do NOT overlap (mapillary.py:731-745)
    touching = df.select(
        tiling.bbox_overlaps(
            F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0),
            F.lit(1.0), F.lit(0.0), F.lit(2.0), F.lit(1.0),
        ).alias("o")
    ).collect()[0]["o"]
    assert touching is False
    overlapping = df.select(
        tiling.bbox_overlaps(
            F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0),
            F.lit(0.999), F.lit(0.0), F.lit(2.0), F.lit(1.0),
        ).alias("o")
    ).collect()[0]["o"]
    assert overlapping is True


def test_point_in_bbox_half_open(spark):
    df = spark.range(1)
    def inb(lon, lat):
        return df.select(
            tiling.point_in_bbox(
                F.lit(lon), F.lit(lat), F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0)
            ).alias("i")
        ).collect()[0]["i"]
    assert inb(0.0, 0.0) is True      # lower edge included
    assert inb(1.0, 0.5) is False     # upper edge excluded
    assert inb(0.5, 1.0) is False
    assert inb(0.9999, 0.9999) is True


def test_edge_covering_cells_contains_endpoint_cells(spark, fixture_dir):
    edges = spark.read.parquet(f"{fixture_dir}/edges.parquet").limit(200)
    cov = tiling.edge_covering_cells(
        edges.select("edge_id", "src", "dst", "lon1", "lat1", "lon2", "lat2"), 16
    )
    cells = {}
    for r in cov.collect():
        cells.setdefault(r["edge_id"], set()).add(r["cell"])
    pts = edges.select(
        "edge_id",
        tiling.cell_of(F.col("lon1"), F.col("lat1"), 16).alias("c1"),
        tiling.cell_of(F.col("lon2"), F.col("lat2"), 16).alias("c2"),
    ).collect()
    for r in pts:
        assert r["c1"] in cells[r["edge_id"]]
        assert r["c2"] in cells[r["edge_id"]]


def test_prune_to_cells(spark, fixture_dir):
    edges = spark.read.parquet(f"{fixture_dir}/edges.parquet")
    cov = tiling.edge_covering_cells(
        edges.select("edge_id", "src", "dst", "lon1", "lat1", "lon2", "lat2"), 16
    )
    keep = cov.select("cell").distinct().limit(10)
    pruned = tiling.prune_to_cells(cov, keep)
    kept_cells = {r["cell"] for r in keep.collect()}
    assert {r["cell"] for r in pruned.collect()} <= kept_cells


def test_salted_join_equals_broadcast(spark, fixture_dir):
    """The shuffled+salted candidate path must produce exactly the broadcast
    path's candidate set (skew handling is a physical choice, not semantic)."""
    from conflation_spark.operators.candidates import candidate_edges
    from conflation_spark.sources.spans import decode_points, load_documents

    pts = decode_points(load_documents(spark, fixture_dir)).limit(20000)
    edges = spark.read.parquet(f"{fixture_dir}/edges.parquet")
    a = candidate_edges(pts, edges, broadcast_edges=True)
    b = candidate_edges(pts, edges, broadcast_edges=False, hot_cell_threshold=50)
    key = ["doc_id", "offset", "edge_id"]
    sa = {tuple(r[k] for k in key) for r in a.select(*key).collect()}
    sb = {tuple(r[k] for k in key) for r in b.select(*key).collect()}
    assert sa == sb and len(sa) > 0


def test_point_in_polygon_ray_casting(spark):
    # unit square + a concave "L" polygon
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    ell = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0)]
    rows = [
        (0.5, 0.5, sq, True), (1.5, 0.5, sq, False), (-0.1, 0.5, sq, False),
        (0.5, 1.5, ell, True), (1.5, 1.5, ell, False), (1.5, 0.5, ell, True),
        (0.5, 0.5, ell, True), (2.5, 0.5, ell, False),
    ]
    df = spark.createDataFrame(
        [(lon, lat, [{"lon": a, "lat": b} for a, b in poly], want)
         for lon, lat, poly, want in rows],
        "lon double, lat double, polygon array<struct<lon:double,lat:double>>, want boolean",
    )
    got = df.select(
        "want", tiling.point_in_polygon(F.col("lon"), F.col("lat"), F.col("polygon")).alias("got")
    ).collect()
    for r in got:
        assert r["got"] == r["want"]
    # the plan-time-constant unrolled variant agrees with the HOF variant
    # (and the truth) on both rings, including concave + boundary cases
    for poly in (sq, ell):
        want = {(lon, lat): w for lon, lat, p, w in rows if p is poly}
        pdf = spark.createDataFrame(
            [(lon, lat) for lon, lat in want], "lon double, lat double"
        )
        got_c = pdf.select(
            "lon", "lat",
            tiling.point_in_polygon_const(F.col("lon"), F.col("lat"), poly).alias("g"),
        ).collect()
        for r in got_c:
            assert r["g"] == want[(r["lon"], r["lat"])]


def test_rasterize_vectorize_roundtrip(spark, fixture_dir):
    from conflation_spark.sources.spans import decode_points, load_documents

    pts = decode_points(load_documents(spark, fixture_dir))
    raster = tiling.rasterize_points(pts, zoom=12)
    total = raster.agg(F.sum("n_points")).collect()[0][0]
    assert total == pts.count()  # every point lands in exactly one cell
    vec = tiling.vectorize_cells(raster, zoom=12)
    rows = vec.limit(50).collect()
    for r in rows:
        poly = r["polygon"]
        assert len(poly) == 4
        assert poly[0]["lon"] < poly[1]["lon"]  # NW -> NE
        assert poly[0]["lat"] > poly[3]["lat"]  # NW above SW
    # each cell's centroid must be inside its own polygon (PIP consistency)
    centroid_lon = (F.col("polygon")[0]["lon"] + F.col("polygon")[1]["lon"]) / 2
    centroid_lat = (F.col("polygon")[0]["lat"] + F.col("polygon")[3]["lat"]) / 2
    inside = vec.select(
        tiling.point_in_polygon(centroid_lon, centroid_lat, F.col("polygon")).alias("i")
    )
    assert all(r["i"] for r in inside.collect())


def test_cell_parent_consistency(spark, fixture_dir):
    from conflation_spark.sources.spans import decode_points, load_documents

    pts = decode_points(load_documents(spark, fixture_dir)).limit(5000)
    df = pts.select(
        tiling.cell_of(F.col("lon"), F.col("lat"), 16).alias("c16"),
        tiling.cell_of(F.col("lon"), F.col("lat"), 5).alias("c5"),
    ).withColumn("parent", tiling.cell_parent(F.col("c16"), 16, 5))
    bad = df.where(F.col("parent") != F.col("c5")).count()
    assert bad == 0


def test_point_in_polygon_matches_raycaster(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from conflation_spark.operators.tiling import point_in_polygon

    poly = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (2.0, 5.0), (0.0, 3.0)]
    rng = np.random.default_rng(5)
    pts = [(float(x), float(y)) for x, y in rng.uniform(-1, 6, size=(300, 2))]

    def inside_py(px, py):
        n, c = len(poly), False
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            if (ay > py) != (by > py) and px < (bx - ax) * (py - ay) / (by - ay) + ax:
                c = not c
        return c

    df = spark.createDataFrame(pts, "lon double, lat double")
    pcol = F.array(*[F.struct(F.lit(a).alias("lon"), F.lit(b).alias("lat")) for a, b in poly])
    got = {
        (r["lon"], r["lat"]): r["in_poly"]
        for r in df.withColumn("in_poly", point_in_polygon(F.col("lon"), F.col("lat"), pcol)).collect()
    }
    want = {(x, y): inside_py(x, y) for x, y in pts}
    assert got == want
    assert sum(want.values()) > 50  # polygon actually contains points


def test_raster_to_runs_merges_adjacent_cells(spark):
    from conflation_spark.operators.tiling import raster_to_runs

    # row y=10: cells x=3,4,5 and x=9; row y=11: x=4
    rows = [(3, 10, 2), (4, 10, 1), (5, 10, 4), (9, 10, 1), (4, 11, 7)]
    raster = spark.createDataFrame(rows, "x long, y long, n_points long")
    runs = {(r["y"], r["x_start"]): r for r in raster_to_runs(raster, zoom=4).collect()}
    assert set(runs) == {(10, 3), (10, 9), (11, 4)}
    assert runs[(10, 3)]["x_end"] == 5 and runs[(10, 3)]["n_cells"] == 3
    assert runs[(10, 3)]["n_points"] == 7
    assert runs[(10, 9)]["n_cells"] == 1
    # bbox sanity: strip spans [w_lon, e_lon) of 3 tiles at zoom 4
    r = runs[(10, 3)]
    assert abs((r["e_lon"] - r["w_lon"]) - 3 * 360.0 / 16) < 1e-9
    assert r["n_lat"] > r["s_lat"]


def test_candidates_range_partition_plan(spark, fixture_dir):
    from pyspark.sql import functions as F

    from conflation_spark.operators.candidates import candidate_edges
    from conflation_spark.sources.spans import decode_points, load_documents

    pts = decode_points(load_documents(spark, fixture_dir))
    edges = spark.read.parquet(f"{fixture_dir}/edges.parquet")
    cand = candidate_edges(pts, edges, broadcast_edges=False, range_partition=8)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(cell" in plan


def test_zorder_roundtrip_and_reference(spark):
    """zorder_key: interleave matches a per-bit numpy reference and
    decode(encode(x, y)) == (x, y) across the 16-bit range."""
    import numpy as np

    from conflation_spark.operators.tiling import zorder_decode, zorder_key

    rng = np.random.default_rng(5)
    xs = rng.integers(0, 1 << 16, 300)
    ys = rng.integers(0, 1 << 16, 300)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    z = zorder_key(F.col("x"), F.col("y"), 16)
    dx, dy = zorder_decode(F.col("z"))
    rows = (
        df.withColumn("z", z)
        .select("x", "y", "z", dx.alias("dx"), dy.alias("dy"))
        .collect()
    )

    def ref(x, y):
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    for r in rows:
        assert r["z"] == ref(r["x"], r["y"])
        assert (r["dx"], r["dy"]) == (r["x"], r["y"])


def test_zorder_rejects_deep_zoom(spark):
    import pytest

    from conflation_spark.operators.tiling import zorder_key

    with pytest.raises(ValueError, match="zoom <= 16"):
        zorder_key(F.lit(1), F.lit(1), 17)


def test_zorder_clustering_prunes_row_groups(spark, fixture_dir, tmp_path):
    """The layout claim, measured: write the fixture's points z-clustered
    vs arrival-ordered with identical row-group sizes, then count parquet
    row groups whose lon/lat min/max stats overlap a small bbox (what a
    stats-pruning scan must read). The z-clustered layout must touch a
    small fraction of its row groups; the arrival order touches most."""
    import pyarrow.parquet as pq

    from conflation_spark.operators.tiling import zorder_clustered
    from conflation_spark.sources.spans import decode_points, load_documents

    import pyarrow as pa

    pts = decode_points(load_documents(spark, fixture_dir)).select("lon", "lat")
    zsorted = str(tmp_path / "zsorted")
    naive = str(tmp_path / "naive")
    # materialize the two orderings from Spark (coalesce(1) + the sort
    # keeps the z clustering in row order), then write with a controlled
    # row-group size so the stats comparison is apples-to-apples
    import os

    os.makedirs(zsorted)
    os.makedirs(naive)
    zpdf = zorder_clustered(pts).drop("z").coalesce(1).toPandas()
    npdf = pts.coalesce(1).toPandas()
    pq.write_table(
        pa.Table.from_pandas(zpdf), f"{zsorted}/part0.parquet", row_group_size=1500
    )
    pq.write_table(
        pa.Table.from_pandas(npdf), f"{naive}/part0.parquet", row_group_size=1500
    )

    # bbox around one urban core (fixture plants clusters; pick the area
    # around the median point)
    import numpy as np

    sample = np.array(pts.limit(4000).collect())
    lon0, lat0 = np.median(sample[:, 0]), np.median(sample[:, 1])
    bbox = (lon0 - 0.02, lat0 - 0.02, lon0 + 0.02, lat0 + 0.02)

    def overlap_fraction(path):
        import glob

        touched = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                slon = rg.column(names["lon"]).statistics
                slat = rg.column(names["lat"]).statistics
                total += 1
                if (
                    slon.max >= bbox[0]
                    and slon.min <= bbox[2]
                    and slat.max >= bbox[1]
                    and slat.min <= bbox[3]
                ):
                    touched += 1
        return touched, total

    zt, ztot = overlap_fraction(zsorted)
    nt, ntot = overlap_fraction(naive)
    assert ztot > 5 and ntot > 5  # row groups actually split
    # z-clustered: small fraction touched; arrival order: most touched
    assert zt / ztot < 0.5 * (nt / ntot), (zt, ztot, nt, ntot)
