"""Rollup parity: Spark grouping-sets exact percentile vs a pandas oracle
mirroring the reference's three hand-rolled groupbys (aggregation.py:89-150),
including the empty-region asymmetry."""

import pandas as pd
import pytest

from conflation_spark.operators.rollup import rollup_medians

KEYS = ["density", "road_class", "type"]


def _oracle(pdf: pd.DataFrame) -> dict:
    """(level, country, region, density, road_class, type) -> median."""
    out = {}
    for (country, region), g in pdf[pdf["region"] != ""].groupby(["country", "region"]):
        med = g.groupby(KEYS)["kph"].median()
        for k, v in med.items():
            out[("region", country, region) + k] = v
    for country, g in pdf.groupby("country"):
        med = g.groupby(KEYS)["kph"].median()
        for k, v in med.items():
            out[("country", country, None) + k] = v
    med = pdf.groupby(KEYS)["kph"].median()
    for k, v in med.items():
        out[("world", None, None) + k] = v
    return out


def test_rollup_matches_pandas_oracle(spark, fixture_dir):
    meas = spark.read.parquet(f"{fixture_dir}/measurements.parquet")
    got_rows = rollup_medians(meas).collect()
    got = {
        (r["level"], r["country"], r["region"], r["density"], r["road_class"], r["type"]): r[
            "median_kph"
        ]
        for r in got_rows
    }
    want = _oracle(meas.toPandas())
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_empty_region_feeds_country_not_region(spark):
    rows = [
        ("AA", "", "rural", "motorway", "way", 100.0),
        ("AA", "", "rural", "motorway", "way", 110.0),
        ("AA", "AA-1", "rural", "motorway", "way", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "country string, region string, density string, road_class string, type string, kph double"
    )
    got = {(r["level"], r["region"]): r["median_kph"] for r in rollup_medians(df).collect()}
    assert got[("region", "AA-1")] == 50.0
    assert got[("country", None)] == 100.0  # median of 50,100,110
    assert got[("world", None)] == 100.0
    assert ("region", "") not in got


def test_even_count_median_interpolates(spark):
    rows = [
        ("AA", "R", "rural", "motorway", "way", float(v)) for v in (10, 20, 40, 80)
    ]
    df = spark.createDataFrame(
        rows, "country string, region string, density string, road_class string, type string, kph double"
    )
    got = {r["level"]: r["median_kph"] for r in rollup_medians(df).collect()}
    assert got["region"] == 30.0  # mean of middles, pandas-median semantics
