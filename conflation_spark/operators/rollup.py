"""Three-level median rollup (reference A1-A4).

Reimplements /root/reference/conflation/aggregation.py:89-150 as ONE
grouping-sets aggregation (single shuffle) instead of the reference's three
hand-rolled pandas groupbys over pickle files.

Reference semantics preserved exactly:
- median = pandas ``DataFrameGroupBy.median()`` = exact linear-interpolated
  percentile -> Spark ``percentile(kph, 0.5)`` (NOT percentile_approx)
  (aggregation.py:129,137,146)
- rollup asymmetry (aggregation.py:112-121): rows with ``region = ''`` count
  toward the country and world levels but produce NO region-level group —
  hence grouping sets with a filtered region level, not plain ``rollup()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVEL_REGION, LEVEL_COUNTRY, LEVEL_WORLD = "region", "country", "world"


def rollup_medians(measurements: DataFrame, extra_keys: list[str] | None = None) -> DataFrame:
    """measurements(country, region, density, road_class, type, kph) ->
    (level, country, region, density, road_class, type[, extra...], median_kph).

    ``country``/``region`` are NULL above their level. One wide shuffle; the
    grouping-sets expansion is map-side (partial percentile buffers combine).
    Pure DataFrame API (``groupingSets``): no temp view, so concurrent calls
    in one session can't race on a shared view name.

    ``extra_keys``: additional grouping columns present at every level (e.g.
    ``["hour"]`` for per-hour speed histograms — north-star extra dimension).
    """
    extra = list(extra_keys or [])
    base = ["density", "road_class", "type", *extra]
    agg = measurements.groupingSets(
        [["country", "region", *base], ["country", *base], base],
        "country",
        "region",
        *base,
    ).agg(
        F.percentile("kph", F.lit(0.5)).alias("median_kph"),
        F.grouping("country").alias("_gc"),
        F.grouping("region").alias("_gr"),
    )
    out = agg.select(
        F.when(F.col("_gc") == 1, "world")
        .when(F.col("_gr") == 1, "country")
        .otherwise("region")
        .alias("level"),
        F.when(F.col("_gc") == 0, F.col("country")).alias("country"),
        F.when(F.col("_gr") == 0, F.col("region")).alias("region"),
        *base,
        "median_kph",
    )
    # drop the empty-region region-level groups (they only feed country/world)
    return out.where(~((F.col("level") == "region") & (F.col("region") == "")))
