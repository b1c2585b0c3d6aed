"""Trace-quality filter stage (reference F1-F10).

Reimplements /root/reference/conflation/trace_filter.py:18-115 as one
window-lag pass + one per-doc aggregation + a semi-join — all built-in
column expressions (JVM-side, whole-stage codegen), no UDFs.

Exact reference semantics preserved:
- haversine with earth radius 6378160 m (trace_filter.py:118-133)
- total time uses positional first/last points (sequence[-1] - sequence[0],
  trace_filter.py:40), i.e. first/last BY OFFSET, not min/max of time —
  they differ for docs with time-regression defects
- any adjacent dt < 0 drops the whole doc (trace_filter.py:69-74)
- dt == 0 pairs contribute NOTHING: no distance, no speed, no counters
  (`continue` fires before `total_dist += d`, trace_filter.py:77-78)
- dt > 5 s and pair speed > 160 km/h each increment the poor-measurement
  counter (both can fire for the same pair, trace_filter.py:81-91)
- poor ratio denominator is the POINT count, not pair count
  (trace_filter.py:97: `num_poor / len(sequence)`)
- mean speed over pairs with dt != 0; when every pair has dt == 0 numpy
  yields NaN and `NaN < 10` is False, so the doc is KEPT (trace_filter.py:108)
- note dt < 0 pairs (only present in already-doomed docs) still add distance
  and a negative speed in the reference; we reproduce that for stat parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6378160.0  # trace_filter.py:132
MINIMUM_MEAN_SPEED = 10.0  # km/h, trace_filter.py:6
MINIMUM_TOTAL_TIME = 55.0  # s, trace_filter.py:7
MINIMUM_TOTAL_DISTANCE = 1000.0  # m, trace_filter.py:8
MAXIMUM_TIME_BETWEEN_ADJACENT_POINTS = 5.0  # s, trace_filter.py:9-11
MAXIMUM_SPEED_BETWEEN_ADJACENT_POINTS = 160.0  # km/h, trace_filter.py:12
MAXIMUM_POOR_MEASUREMENTS_PERCENT = 0.25  # trace_filter.py:13-15
MINIMUM_IMAGES_PER_SEQUENCE = 30  # v4 fetch-time filter, mapillary.py:22-24


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle meters, reference formula (trace_filter.py:118-133)."""
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    a = F.pow(F.sin((rlat2 - rlat1) / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin((rlon2 - rlon1) / 2), 2
    )
    return F.asin(F.sqrt(a)) * F.lit(2.0 * EARTH_RADIUS_M)


def with_pair_deltas(points: DataFrame) -> DataFrame:
    """Add lag-window pair columns (dt seconds, d meters, v_kmph) per doc.

    One shuffle on doc_id; reused by the aggregation below.
    """
    w = Window.partitionBy("doc_id").orderBy("offset")
    lagged = points.select(
        "doc_id",
        "offset",
        "time",
        "lon",
        "lat",
        F.lag("time").over(w).alias("p_time"),
        F.lag("lon").over(w).alias("p_lon"),
        F.lag("lat").over(w).alias("p_lat"),
    )
    d = haversine_m(F.col("p_lon"), F.col("p_lat"), F.col("lon"), F.col("lat"))
    dt = F.col("time") - F.col("p_time")
    return lagged.withColumn("dt", dt).withColumn("d", d).withColumn(
        "v_kmph", F.when(F.col("dt") != 0, F.col("d") / 1000.0 / F.col("dt") * 3600.0)
    )


def doc_stats(points: DataFrame) -> DataFrame:
    """Per-doc aggregates mirroring the reference's per-sequence loop."""
    pairs = with_pair_deltas(points)
    nonzero = F.col("dt").isNotNull() & (F.col("dt") != 0)
    return pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.max_by("time", "offset") - F.min_by("time", "offset")).alias("total_time"),
        F.coalesce(F.sum(F.when(nonzero, F.col("d"))), F.lit(0.0)).alias("total_dist"),
        F.coalesce(
            F.sum(
                F.when(F.col("dt") > MAXIMUM_TIME_BETWEEN_ADJACENT_POINTS, 1).otherwise(0)
                + F.when(
                    nonzero & (F.col("v_kmph") > MAXIMUM_SPEED_BETWEEN_ADJACENT_POINTS), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("num_poor"),
        F.max(F.when(F.col("dt") < 0, 1).otherwise(0)).alias("has_negative_dt"),
        F.avg(F.when(nonzero, F.col("v_kmph"))).alias("mean_speed"),
    )


def accept_condition(min_points: int | None = None) -> Column:
    """The reference's accept predicate over doc_stats columns."""
    c = (
        (F.col("total_time") >= MINIMUM_TOTAL_TIME)
        & (F.col("has_negative_dt") == 0)
        & (F.col("num_poor") / F.col("n_points") <= MAXIMUM_POOR_MEASUREMENTS_PERCENT)
        & (F.col("total_dist") >= MINIMUM_TOTAL_DISTANCE)
        # NaN/NULL mean (all-zero-dt doc) is kept by the reference
        & (F.col("mean_speed").isNull() | (F.col("mean_speed") >= MINIMUM_MEAN_SPEED))
    )
    if min_points is not None:
        c = c & (F.col("n_points") >= min_points)
    return c


def accepted_doc_ids(points: DataFrame, min_points: int | None = None) -> DataFrame:
    return doc_stats(points).where(accept_condition(min_points)).select("doc_id")


def filter_traces(points: DataFrame, min_points: int | None = None) -> DataFrame:
    """points -> points of accepted docs only, plus ``gps_idx`` (0-based
    dense index of the point within its doc, ordered by offset).

    ``gps_idx`` costs nothing here (the ordered window already exists) and
    is what lets the matcher run with a SINGLE shuffle: downstream, a point
    missing from the candidate set is detected as a gps_idx gap instead of
    by left-joining the full points table back in (see
    ``matching.match_traces``).

    Physical shape: ONE hash shuffle on doc_id serves both the ordered lag
    window (pair deltas) and the whole-partition aggregate windows (per-doc
    stats), then a plain filter — no second decode branch and no semi-join
    (a naive `join(accepted_ids, left_semi)` plan scans+decodes the input
    twice and adds a sort-merge join; this form halved the stage time at
    sf1).
    """
    w_ord = Window.partitionBy("doc_id").orderBy("offset")
    w_all = Window.partitionBy("doc_id")
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    lag_time = F.lag("time").over(w_ord)
    lag_lon = F.lag("lon").over(w_ord)
    lag_lat = F.lag("lat").over(w_ord)
    dt = F.col("time") - lag_time
    d = haversine_m(lag_lon, lag_lat, F.col("lon"), F.col("lat"))
    v = d / 1000.0 / dt * 3600.0
    nonzero = dt.isNotNull() & (dt != 0)

    pair_d = F.when(nonzero, d)
    pair_poor = F.when(dt > MAXIMUM_TIME_BETWEEN_ADJACENT_POINTS, 1).otherwise(0) + F.when(
        nonzero & (v > MAXIMUM_SPEED_BETWEEN_ADJACENT_POINTS), 1
    ).otherwise(0)
    pair_neg = F.when(dt < 0, 1).otherwise(0)
    pair_v = F.when(nonzero, v)

    df = points.withColumn("_ttime", F.last("time").over(w_full) - F.first("time").over(w_full))
    df = df.withColumn("gps_idx", (F.row_number().over(w_ord) - 1).cast("int"))
    # gc_prev: great-circle meters to the PREVIOUS point (0 for the first).
    # Free here (the ordered window already exists); the matcher's transition
    # model consumes it directly, so candidate rows don't have to carry
    # (lon, lat) through the traversal stage's sort + Arrow boundary.
    df = df.withColumn("gc_prev", F.coalesce(d, F.lit(0.0)))
    df = (
        df.withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_dist", F.coalesce(F.sum(pair_d).over(w_all), F.lit(0.0)))
        .withColumn("_poor", F.coalesce(F.sum(pair_poor).over(w_all), F.lit(0)))
        .withColumn("_neg", F.max(pair_neg).over(w_all))
        .withColumn("_vavg", F.avg(pair_v).over(w_all))
    )
    cond = (
        (F.col("_ttime") >= MINIMUM_TOTAL_TIME)
        & (F.col("_neg") == 0)
        & (F.col("_poor") / F.col("_n") <= MAXIMUM_POOR_MEASUREMENTS_PERCENT)
        & (F.col("_dist") >= MINIMUM_TOTAL_DISTANCE)
        & (F.col("_vavg").isNull() | (F.col("_vavg") >= MINIMUM_MEAN_SPEED))
    )
    if min_points is not None:
        cond = cond & (F.col("_n") >= min_points)
    return df.where(cond).drop("_ttime", "_n", "_dist", "_poor", "_neg", "_vavg")
