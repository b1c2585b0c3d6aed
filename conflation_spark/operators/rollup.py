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


def rollup_medians(measurements: DataFrame) -> DataFrame:
    """measurements(country, region, density, road_class, type, kph) ->
    (level, country, region, density, road_class, type, median_kph).

    ``country``/``region`` are NULL above their level. One wide shuffle; the
    grouping-sets expansion is map-side (partial percentile buffers combine).
    """
    measurements.createOrReplaceTempView("_rollup_in")
    spark = measurements.sparkSession
    out = spark.sql(
        """
        SELECT
          CASE WHEN grouping(country) = 1 THEN 'world'
               WHEN grouping(region) = 1 THEN 'country'
               ELSE 'region' END AS level,
          CASE WHEN grouping(country) = 0 THEN country END AS country,
          CASE WHEN grouping(region) = 0 THEN region END AS region,
          density, road_class, type,
          percentile(kph, 0.5) AS median_kph
        FROM _rollup_in
        GROUP BY GROUPING SETS (
          (country, region, density, road_class, type),
          (country, density, road_class, type),
          (density, road_class, type)
        )
        """
    )
    # drop the empty-region region-level groups (they only feed country/world)
    return out.where(~((F.col("level") == "region") & (F.col("region") == "")))
