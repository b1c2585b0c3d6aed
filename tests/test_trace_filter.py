"""Trace-filter parity vs the pure-Python oracle, plus boundary-value docs
per FIXTURES.md §4 (constants 55 s / 1000 m / 10 kph / 160 kph / 5 s / 25%)."""

import json

import pytest

from conflation_spark.operators.trace_filter import (
    accepted_doc_ids,
    doc_stats,
    haversine_m,
)
from conflation_spark.sources.spans import decode_points, load_documents
from tests import oracle


def test_accepted_docs_match_oracle(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    pts = decode_points(docs)
    got = {r["doc_id"] for r in accepted_doc_ids(pts).collect()}
    want = set()
    for row in docs.collect():
        points = oracle.decode_doc([s.asDict() for s in row["spans"]])
        if points and oracle.trace_filter_accept(points):
            want.add(row["doc_id"])
    assert got == want
    assert 0 < len(want) < docs.count()  # defects actually filtered something


def test_doc_stats_match_oracle(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    pts = decode_points(docs)
    got = {r["doc_id"]: r.asDict() for r in doc_stats(pts).collect()}
    for row in docs.collect():
        points = oracle.decode_doc([s.asDict() for s in row["spans"]])
        if not points:
            continue
        want = oracle.trace_filter_stats(points)
        g = got[row["doc_id"]]
        assert g["n_points"] == want["n_points"]
        assert g["num_poor"] == want["num_poor"]
        assert bool(g["has_negative_dt"]) == want["has_negative_dt"]
        assert g["total_time"] == pytest.approx(want["total_time"], abs=1e-9)
        assert g["total_dist"] == pytest.approx(want["total_dist"], rel=1e-9)
        if want["mean_speed"] == want["mean_speed"]:  # not NaN
            assert g["mean_speed"] == pytest.approx(want["mean_speed"], rel=1e-9)
        else:
            assert g["mean_speed"] is None


def _mkdoc(spark, points):
    """Build a one-doc documents DF from a list of (time, lon, lat)."""
    spans = [
        {
            "kind": "gps",
            "text": json.dumps({"time": t, "lon": lon, "lat": lat}),
            "media_ref": f"i{i}",
            "offset": i,
        }
        for i, (t, lon, lat) in enumerate(points)
    ]
    return spark.createDataFrame(
        [("d0", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def _accepted(spark, points):
    pts = decode_points(_mkdoc(spark, points))
    return accepted_doc_ids(pts).count() == 1


def _walk(n, dt, step_deg, lon0=10.0, lat0=35.0, t0=0.0):
    """n points marching east, fixed dt seconds and step degrees."""
    return [(t0 + i * dt, lon0 + i * step_deg, lat0) for i in range(n)]


def test_boundary_total_time(spark):
    # 0.0005 deg lon at lat 35 ~ 45.6 m -> fast enough, far enough
    good = _walk(30, 2.0, 0.0005)  # 58 s total
    assert _accepted(spark, good)
    short = _walk(28, 1.9, 0.0005)  # 51.3 s < 55
    assert not _accepted(spark, short)


def test_boundary_total_distance(spark):
    # total distance just under 1000 m: 30 points * small steps
    slow = _walk(30, 2.0, 0.00036)  # ~32.8m per step * 29 ~ 952 m < 1000
    assert not _accepted(spark, slow)
    far = _walk(30, 2.0, 0.00040)  # ~36.5m * 29 ~ 1058 m
    assert _accepted(spark, far)


def test_boundary_mean_speed(spark):
    # ~45.6 m per 17 s -> 9.7 kph < 10
    walkpace = _walk(60, 17.0, 0.0005)
    assert not _accepted(spark, walkpace)


def test_negative_dt_drops_doc(spark):
    pts = _walk(40, 2.0, 0.0005)
    t, lon, lat = pts[10]
    pts[10] = (pts[8][0] - 1.0, lon, lat)
    assert not _accepted(spark, pts)


def test_zero_dt_pairs_ignored(spark):
    pts = _walk(40, 2.0, 0.0005)
    # duplicate timestamps: pair contributes nothing (reference `continue`)
    pts[5] = (pts[4][0], pts[5][1], pts[5][2])
    assert _accepted(spark, pts)


def test_poor_ratio_gap_counter(spark):
    # all dt = 6 s > 5 s: num_poor = n-1, ratio (n-1)/n > 0.25 -> dropped
    gappy = _walk(40, 6.0, 0.0012)
    assert not _accepted(spark, gappy)


def test_poor_ratio_speed_counter(spark):
    # every pair > 160 kph: 0.002 deg / 2 s = ~182m/2s = 328 kph
    fast = _walk(40, 2.0, 0.002)
    assert not _accepted(spark, fast)


def test_haversine_radius_parity(spark):
    df = spark.range(1).select(
        haversine_m(
            *(map(lambda v: __import__("pyspark.sql.functions", fromlist=["lit"]).lit(v),
                  (10.0, 35.0, 10.001, 35.001)))
        ).alias("d")
    )
    got = df.collect()[0]["d"]
    want = oracle.haversine_m(10.0, 35.0, 10.001, 35.001)
    assert got == pytest.approx(want, rel=1e-12)
