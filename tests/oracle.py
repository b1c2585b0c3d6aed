"""Pure-Python oracle reimplementing the reference's per-sequence semantics.

Used by tests to validate the Spark operators doc-by-doc. This is an
independent re-expression of the documented behavior of
/root/reference/conflation/trace_filter.py:18-133 and
/root/reference/conflation/map_matching/valhalla.py:129-309 — not a copy.
"""

from __future__ import annotations

import json
import math

EARTH_RADIUS_M = 6378160.0


def haversine_m(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = map(math.radians, (lon1, lat1, lon2, lat2))
    a = (
        math.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * math.asin(math.sqrt(a)) * EARTH_RADIUS_M


def decode_doc(spans) -> list[dict]:
    """GPS points of one document in offset order."""
    pts = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "gps":
            p = json.loads(s["text"])
            pts.append(p)
    return pts


def trace_filter_stats(points: list[dict]) -> dict:
    """Per-sequence stats exactly as the reference loop computes them
    (trace_filter.py:37-111): dt==0 pairs contribute nothing; dt<0 flags the
    doc but still adds distance and a (negative) speed; poor counter can
    increment twice per pair; denominator is the point count."""
    total_time = points[-1]["time"] - points[0]["time"] if points else 0.0
    total_dist = 0.0
    num_poor = 0
    has_neg = False
    speeds = []
    for i in range(len(points) - 1):
        a, b = points[i], points[i + 1]
        d = haversine_m(a["lon"], a["lat"], b["lon"], b["lat"])
        t = b["time"] - a["time"]
        if t < 0:
            has_neg = True
        if t == 0:
            continue
        if t > 5:
            num_poor += 1
        total_dist += d
        v = d / 1000 / t * 3600
        if v > 160:
            num_poor += 1
        speeds.append(v)
    mean_speed = sum(speeds) / len(speeds) if speeds else float("nan")
    return dict(
        n_points=len(points),
        total_time=total_time,
        total_dist=total_dist,
        num_poor=num_poor,
        has_negative_dt=has_neg,
        mean_speed=mean_speed,
    )


def trace_filter_accept(points: list[dict], min_points: int | None = None) -> bool:
    if not points:
        return False
    if min_points is not None and len(points) < min_points:
        return False
    s = trace_filter_stats(points)
    if s["total_time"] < 55:
        return False
    if s["has_negative_dt"]:
        return False
    if s["num_poor"] / s["n_points"] > 0.25:
        return False
    if s["total_dist"] < 1000:
        return False
    if s["mean_speed"] < 10:  # NaN < 10 is False -> kept, as in the reference
        return False
    return True


def derive_measurements(traversals, edges_by_id):
    """Reference M1-M12 loop semantics over matcher traversal rows.

    traversals: list of dicts (doc_id, edge_seq, edge_id, elapsed_time,
    n_points, n_unmatched) for ONE doc, ordered by edge_seq.
    edges_by_id: edge_id -> dict of edge attrs.
    Returns list of (country, region, density, road_class, type, kph).
    """
    if not traversals:
        return []
    if traversals[0]["n_unmatched"] / traversals[0]["n_points"] > 0.25:
        return []
    out = []
    prev_t = traversals[0]["elapsed_time"]
    for tr in traversals[1:-1]:
        e = edges_by_id[tr["edge_id"]]
        t = tr["elapsed_time"]
        if t < prev_t:
            return out  # abort, keep earlier emissions
        if t == prev_t:
            continue  # skip without advancing prev_t
        kph = e["length_km"] / (t - prev_t) * 3600.0
        if kph > 160:
            return out
        density = (
            "rural" if e["density"] < 5 else ("suburban" if e["density"] < 11 else "urban")
        )
        rc = "service" if e["road_class"] == "service_other" else e["road_class"]
        use = e["use"]
        special = {
            "driveway": "driveway",
            "alley": "alley",
            "parking_aisle": "parking_aisle",
            "drive_through": "drive-through",
        }
        if use in special:
            typ = special[use]
        elif e["roundabout"]:
            typ = "roundabout"
        elif use in ("ramp", "turn_channel"):
            typ = "link_exiting" if e["sign_cnt"] > 0 else "link_turning"
        else:
            typ = "way"
        out.append((e["country"], e["region"], density, rc, typ, kph))
        prev_t = t
    return out
