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


def rollup_medians_hist(
    measurements: DataFrame,
    lo: float = 0.0,
    hi: float = 200.0,
    n_bins: int = 256,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Approximate (histogram-sketch) tier of the 3-level rollup — the
    100-TB path; ``rollup_medians`` stays the exact reference-parity path.

    Why it scales better than the exact form: the grouping-sets exact
    rollup REPLICATES every measurement row once per level through the
    shuffle (3x shuffle volume) and its percentile buffers hold the full
    per-group value multiset. Here each row shuffles ONCE, to its finest
    (country, region, ...) group, collapsing immediately to at most
    ``n_bins`` counting rows per group (the mergeable fixed-grid sketch,
    `operators/sketch.py`); the country and world levels then re-aggregate
    that tiny histogram table bin-wise — two extra jobs over data orders
    of magnitude smaller than the measurements. Determinism is exact
    (counts + fixed grid); the VALUE is approximate with a precise bound:
    the estimate lies within one bin width ((hi-lo)/n_bins; default
    200/256 = 0.78 kph) of the rank-ceil(n/2) ORDER STATISTIC of the
    group. The exact interpolated median sits between the two middle
    order statistics, so for the large-n groups this tier exists for the
    two definitions coincide; a tiny sparse group whose middle values
    fall in different bins can differ by their gap — a property of the
    interpolation definition, not of the sketch (tested with the
    order-statistic bound). Values outside [lo, hi) clamp to the edge
    bins.

    Reference semantics otherwise preserved: empty-region rows feed the
    country/world histograms but emit no region-level group
    (aggregation.py:112-121 asymmetry), same output shape as
    ``rollup_medians`` with ``median_kph`` carrying the estimate.
    """
    from conflation_spark.operators.sketch import histogram_quantile, quantile_histogram

    extra = list(extra_keys or [])
    base = ["density", "road_class", "type", *extra]
    # the finest-level histogram IS the sketch operator (one definition of
    # the bin grid). All three level branches read it; a LAZY
    # localCheckpoint guarantees the measurements scan + histogram shuffle
    # run exactly once ACROSS the branches (AQE's exchange reuse is not
    # reliable across union stages) while keeping the builder action-free
    # — materialization happens at the caller's first action. The
    # retained blocks are the tiny bin table (<= groups x n_bins counting
    # rows) and stay alive because the returned frame reads them — the
    # same accepted pattern as connected_components' final label
    # checkpoint (operators/cluster.py); callers running MANY rollups in
    # one long session can free consumed results via
    # cluster._free_local_checkpoint.
    fin = quantile_histogram(
        measurements, "kph", lo, hi, n_bins, group_cols=["country", "region", *base]
    ).localCheckpoint(eager=False)
    region = histogram_quantile(
        fin.where(F.col("region") != ""), 0.5, lo, hi, n_bins,
        group_cols=["country", "region", *base],
    ).select(
        F.lit(LEVEL_REGION).alias("level"), "country", "region", *base,
        F.col("q_value").alias("median_kph"),
    )
    cn = fin.groupBy("country", *base, "bin").agg(F.sum("n").alias("n"))
    country = histogram_quantile(
        cn, 0.5, lo, hi, n_bins, group_cols=["country", *base]
    ).select(
        F.lit(LEVEL_COUNTRY).alias("level"), "country",
        F.lit(None).cast("string").alias("region"), *base,
        F.col("q_value").alias("median_kph"),
    )
    wd = fin.groupBy(*base, "bin").agg(F.sum("n").alias("n"))
    world = histogram_quantile(wd, 0.5, lo, hi, n_bins, group_cols=base).select(
        F.lit(LEVEL_WORLD).alias("level"),
        F.lit(None).cast("string").alias("country"),
        F.lit(None).cast("string").alias("region"), *base,
        F.col("q_value").alias("median_kph"),
    )
    return region.unionByName(country).unionByName(world)
