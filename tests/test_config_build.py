"""Golden interp/extrap vectors (same input/expected as the reference's own
unit test, /root/reference/tests.py:5-91) + pivot/rounding parity."""

from conflation_spark.functions.config_build import (
    measurements_to_config,
    perform_interp_extrap,
    render_config_json,
)

# Golden vectors expressed compactly: per density, the tuple is
# (way[8], link_exiting[5], link_turning[5], roundabout[8],
#  driveway, alley, parking_aisle, drive-through). "." = None.
# Values match the reference's own unit-test case exactly.
def _blk(way, lex, ltu, rab, drv, aly, park, dthru):
    dec = lambda s: [None if x == "." else int(x) for x in s.split()]  # noqa: E731
    return {
        "way": dec(way),
        "link_exiting": dec(lex),
        "link_turning": dec(ltu),
        "roundabout": dec(rab),
        "driveway": drv,
        "alley": aly,
        "parking_aisle": park,
        "drive-through": dthru,
    }


GOLDEN_INPUT = {
    "iso3166-1": "FR",
    "rural": _blk(". . 55 45 . 30 . .", "72 67 . 57 53", ". 73 43 41 .",
                  "40 31 25 24 . . . .", 16, 12, 40, 15),
    "suburban": _blk("90 . . . . . . 13", ". . . . 45", "50 62 . 35 30",
                     "37 32 27 20 19 . . .", 16, 10, 31, 10),
    "urban": _blk(". . . . . 20 15 10", ". . 23 59 .", ". 43 32 21 19",
                  "32 27 22 17 16 16 14 .", None, None, None, None),
}

# expected: interior interpolation + two-end extrapolation filled in;
# suburban link_exiting skipped (<2 points), suburban link_turning and
# urban link_exiting skipped (non-monotonic)
GOLDEN_EXPECTED = {
    "iso3166-1": "FR",
    "rural": _blk("75 65 55 45 38 30 22 14", "72 67 62 57 53", "103 73 43 41 39",
                  "40 31 25 24 23 22 21 20", 16, 12, 40, 15),
    "suburban": _blk("90 79 68 57 46 35 24 13", ". . . . 45", "50 62 . 35 30",
                     "37 32 27 20 19 18 17 16", 16, 10, 31, 10),
    "urban": _blk("45 40 35 30 25 20 15 10", ". . 23 59 .", "54 43 32 21 19",
                  "32 27 22 17 16 16 14 12", None, None, None, None),
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
