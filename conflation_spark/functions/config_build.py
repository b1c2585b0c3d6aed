"""Speed-config pivot, interpolation/extrapolation, and JSON sink.

Driver-side finishing pass over the (tiny, <= a few thousand rows) collected
rollup output — reference A5-A8 + S12:

- pivot of (density, road_class, type) -> kph into the OpenStreetMapSpeeds
  schema config dicts (/root/reference/conflation/aggregation.py:172-214)
- piecewise-linear interior interpolation + two-end extrapolation with
  140/10 clamps and the <2-points / non-monotonic skip guards
  (aggregation.py:216-280)
- Python ``round`` (half-to-even) on medians and interpolated values —
  deliberately NOT Spark's half-up ``round`` (aggregation.py:202,237)
- the reference's exact regex prettification of the final JSON
  (aggregation.py:155-169)

Entry order is deterministic: countries sorted, each country's regions
sorted then the country-level entry, world entry last (the reference's
``os.walk`` order is filesystem-dependent; we fix it).
"""

from __future__ import annotations

import copy
import json
import os
import re

import numpy as np

DENSITIES = ["rural", "suburban", "urban"]
ARRAY_TYPES_8 = ["way", "roundabout"]
LINK_TYPES = ["link_exiting", "link_turning"]
SCALAR_TYPES = ["driveway", "alley", "parking_aisle", "drive-through"]
INTERP_TYPES = ["way", "link_exiting", "link_turning", "roundabout"]
EXTRAP_MAX_SPEED = 140  # aggregation.py:53
EXTRAP_MIN_SPEED = 10  # aggregation.py:54

ROAD_CLASS_INDEX = {  # aggregation.py:56-65
    "motorway": 0,
    "trunk": 1,
    "primary": 2,
    "secondary": 3,
    "tertiary": 4,
    "unclassified": 5,
    "residential": 6,
    "service": 7,
}


def _base_config() -> dict:
    """Empty config skeleton per the OpenStreetMapSpeeds/schema shape
    (aggregation.py:14-48)."""
    density_block = {
        "way": [None] * 8,
        "link_exiting": [None] * 5,
        "link_turning": [None] * 5,
        "roundabout": [None] * 8,
        "driveway": None,
        "alley": None,
        "parking_aisle": None,
        "drive-through": None,
    }
    cfg = {"iso3166-1": None, "iso3166-2": None}
    for d in DENSITIES:
        cfg[d] = copy.deepcopy(density_block)
    return cfg


def measurements_to_config(rows, country, region) -> dict:
    """rows: iterable of (density, road_class, type, median_kph).

    Scatter medians into the config skeleton (aggregation.py:172-214) and run
    interp/extrap. ``round`` is Python's (half-to-even), as in
    ``round(kph[0])`` at aggregation.py:202.
    """
    cfg = _base_config()
    if country:
        cfg["iso3166-1"] = country
    else:
        del cfg["iso3166-1"]
    if region:
        cfg["iso3166-2"] = region
    else:
        del cfg["iso3166-2"]

    for density, road_class, type_, kph in rows:
        kph = round(float(kph))
        if type_ in ARRAY_TYPES_8:
            cfg[density][type_][ROAD_CLASS_INDEX[road_class]] = kph
        elif type_ in LINK_TYPES and ROAD_CLASS_INDEX[road_class] < 5:
            cfg[density][type_][ROAD_CLASS_INDEX[road_class]] = kph
        elif type_ in SCALAR_TYPES:
            cfg[density][type_] = kph
        # unknown types are ignored (reference logs a warning)
    return perform_interp_extrap(cfg)


def perform_interp_extrap(cfg: dict) -> dict:
    """Fill missing road-class slots per density x type (aggregation.py:216-280).

    Guards: skip arrays with <2 data points; skip arrays whose known values
    strictly increase anywhere (speeds must be nonincreasing by class index).
    Interior fill: ``round(np.interp(...))``. Ends: linear extrapolation from
    the two nearest filled slots, clamped to [10, 140] (head clamps max,
    tail clamps min — exactly the reference's asymmetry).
    """
    for density in DENSITIES:
        for type_ in INTERP_TYPES:
            speeds = cfg[density][type_]
            known_idx = [i for i, v in enumerate(speeds) if v is not None]
            known_val = [v for v in speeds if v is not None]
            if len(known_idx) < 2:
                continue
            if any(known_val[i - 1] < known_val[i] for i in range(1, len(known_val))):
                continue
            lo, hi = min(known_idx), max(known_idx)
            for i in range(len(speeds)):
                if speeds[i] is None and lo < i < hi:
                    speeds[i] = round(float(np.interp(i, known_idx, known_val)))
            # head extrapolation
            stack = []
            for i in range(len(speeds)):
                if speeds[i] is None:
                    stack.append(i)
                else:
                    slope = speeds[i + 1] - speeds[i]
                    while stack:
                        j = stack.pop()
                        speeds[j] = min(speeds[i] - (i - j) * slope, EXTRAP_MAX_SPEED)
                    break
            # tail extrapolation
            for i in range(len(speeds) - 1, -1, -1):
                if speeds[i] is None:
                    stack.append(i)
                else:
                    slope = speeds[i] - speeds[i - 1]
                    while stack:
                        j = stack.pop()
                        speeds[j] = max(speeds[i] + (j - i) * slope, EXTRAP_MIN_SPEED)
                    break
    return cfg


def rollup_to_configs(rollup_rows) -> list[dict]:
    """Collected rollup_medians rows -> ordered list of config dicts.

    Mirrors the reference walk (aggregation.py:89-150): per country, region
    entries then the country entry; world entry last — but in sorted order
    for determinism.
    """
    region_rows: dict[tuple, list] = {}
    country_rows: dict[str, list] = {}
    world_rows: list = []
    for r in rollup_rows:
        tup = (r["density"], r["road_class"], r["type"], r["median_kph"])
        if r["level"] == "region":
            region_rows.setdefault((r["country"], r["region"]), []).append(tup)
        elif r["level"] == "country":
            country_rows.setdefault(r["country"], []).append(tup)
        else:
            world_rows.append(tup)

    configs = []
    for country in sorted(country_rows):
        for (c, region) in sorted(k for k in region_rows if k[0] == country):
            configs.append(measurements_to_config(region_rows[(c, region)], c, region))
        configs.append(measurements_to_config(country_rows[country], country, None))
    if world_rows:
        configs.append(measurements_to_config(world_rows, None, None))
    return configs


def render_config_json(configs: list[dict]) -> str:
    """The reference's exact regex prettification (aggregation.py:155-169)."""
    s = json.dumps(configs)
    s = re.sub('("rural|"suburban|"urban|"iso3166)', os.linesep + r"    \1", s)
    s = re.sub('("way|"link|"round|"driveway)', os.linesep + r"      \1", s)
    s = re.sub(", {", "," + os.linesep + "  {", s)
    s = re.sub("\\[{", "[" + os.linesep + "  {", s)
    s = re.sub("}]", "}" + os.linesep + "]", s)
    return s


def write_config(configs: list[dict], results_dir: str) -> str:
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, "config.json")
    with open(path, "w") as f:
        f.write(render_config_json(configs))
    return path
