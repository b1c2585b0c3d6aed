"""Golden interp/extrap vectors (same input/expected as the reference's own
unit test, /root/reference/tests.py:5-91) + pivot/rounding parity."""

from conflation_spark.functions.config_build import (
    measurements_to_config,
    perform_interp_extrap,
    render_config_json,
)

GOLDEN_INPUT = {
    "iso3166-1": "FR",
    "rural": {
        "way": [None, None, 55, 45, None, 30, None, None],
        "link_exiting": [72, 67, None, 57, 53],
        "link_turning": [None, 73, 43, 41, None],
        "roundabout": [40, 31, 25, 24, None, None, None, None],
        "driveway": 16,
        "alley": 12,
        "parking_aisle": 40,
        "drive-through": 15,
    },
    "suburban": {
        "way": [90, None, None, None, None, None, None, 13],
        "link_exiting": [None, None, None, None, 45],
        "link_turning": [50, 62, None, 35, 30],
        "roundabout": [37, 32, 27, 20, 19, None, None, None],
        "driveway": 16,
        "alley": 10,
        "parking_aisle": 31,
        "drive-through": 10,
    },
    "urban": {
        "way": [None, None, None, None, None, 20, 15, 10],
        "link_exiting": [None, None, 23, 59, None],
        "link_turning": [None, 43, 32, 21, 19],
        "roundabout": [32, 27, 22, 17, 16, 16, 14, None],
        "driveway": None,
        "alley": None,
        "parking_aisle": None,
        "drive-through": None,
    },
}

GOLDEN_EXPECTED = {
    "iso3166-1": "FR",
    "rural": {
        "way": [75, 65, 55, 45, 38, 30, 22, 14],
        "link_exiting": [72, 67, 62, 57, 53],
        "link_turning": [103, 73, 43, 41, 39],
        "roundabout": [40, 31, 25, 24, 23, 22, 21, 20],
        "driveway": 16,
        "alley": 12,
        "parking_aisle": 40,
        "drive-through": 15,
    },
    "suburban": {
        "way": [90, 79, 68, 57, 46, 35, 24, 13],
        "link_exiting": [None, None, None, None, 45],  # <2 points: skip
        "link_turning": [50, 62, None, 35, 30],  # non-monotonic: skip
        "roundabout": [37, 32, 27, 20, 19, 18, 17, 16],
        "driveway": 16,
        "alley": 10,
        "parking_aisle": 31,
        "drive-through": 10,
    },
    "urban": {
        "way": [45, 40, 35, 30, 25, 20, 15, 10],
        "link_exiting": [None, None, 23, 59, None],  # non-monotonic: skip
        "link_turning": [54, 43, 32, 21, 19],
        "roundabout": [32, 27, 22, 17, 16, 16, 14, 12],
        "driveway": None,
        "alley": None,
        "parking_aisle": None,
        "drive-through": None,
    },
}


def test_golden_interp_extrap():
    import copy

    assert perform_interp_extrap(copy.deepcopy(GOLDEN_INPUT)) == GOLDEN_EXPECTED


def test_half_even_rounding():
    # Python round is half-to-even: 42.5 -> 42, 43.5 -> 44 (aggregation.py:202)
    rows = [
        ("rural", "motorway", "way", 42.5),
        ("rural", "trunk", "way", 43.5),
        ("rural", "primary", "driveway", 10.5),  # scalar overwritten by type
    ]
    cfg = measurements_to_config(
        [("rural", "motorway", "way", 42.5), ("rural", "trunk", "way", 43.5)], "AA", None
    )
    assert cfg["rural"]["way"][0] == 42
    assert cfg["rural"]["way"][1] == 44
    del rows


def test_link_only_first_five_classes():
    cfg = measurements_to_config(
        [
            ("urban", "residential", "link_exiting", 30.0),  # idx 6 >= 5: dropped
            ("urban", "motorway", "link_exiting", 80.0),
            ("urban", "service", "way", 20.0),
        ],
        None,
        None,
    )
    assert cfg["urban"]["link_exiting"][0] == 80
    assert all(v is None for v in cfg["urban"]["link_exiting"][1:])
    assert cfg["urban"]["way"][7] == 20
    assert "iso3166-1" not in cfg and "iso3166-2" not in cfg


def test_render_matches_reference_formatting():
    cfg = measurements_to_config([("rural", "motorway", "way", 100.0)], "AA", "AA-1")
    s = render_config_json([cfg])
    # reference regexes insert linesep before these tokens (aggregation.py:158-168)
    assert '\n    "iso3166' in s or "\r\n    \"iso3166" in s
    assert s.startswith("[\n  {") or s.startswith("[\r\n  {")
    assert s.endswith("}\n]") or s.endswith("}\r\n]")
