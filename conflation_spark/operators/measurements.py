"""Per-edge speed derivation (reference M1-M12,
/root/reference/conflation/map_matching/valhalla.py:129-309).

Input: traversal rows from the matcher (doc_id, edge_seq, edge_id,
elapsed_time, n_points, n_unmatched) joined to the edges table for
attributes. All column ops + windows; the reference's stateful loop
subtleties are reproduced with the first-violation-index pattern:

- M1  drop doc if n_unmatched / n_points > 0.25 (valhalla.py:11-13,303-309)
- M2  interior edges only: first & last traversal excluded (valhalla.py:171-173)
- M3  dt = elapsed_time - prev, prev seeded from the FIRST (trimmed) edge
      (valhalla.py:171,180-181)
- M4  elapsed_time < prev  => abort the REST of the doc, keep earlier
      emissions (`return` mid-loop, valhalla.py:183-190)
- M5  elapsed_time == prev => skip edge WITHOUT advancing prev
      (valhalla.py:192-195) — since times are nondecreasing before the first
      violation, prev == running max of preceding elapsed_times, so a
      prefix-max window reproduces the non-advancing semantics exactly
- M6  kph = length_km / dt * 3600 (valhalla.py:197)
- M7  kph > 160 => abort rest of doc, same partial-emit caveat
      (valhalla.py:14,199-204)
- M8  density <5 rural, <11 suburban, else urban (valhalla.py:274-285)
- M9  type precedence: special uses > roundabout > ramp/turn_channel
      (sign => link_exiting else link_turning) > way (valhalla.py:246-271)
- M10 service_other -> service (valhalla.py:178-179)
- M11 admin attribution = country/region columns on the edges table (J4)
- M12 grouping keys are plain columns on the fact DataFrame
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAXIMUM_UNMATCHED_PERCENTAGE = 0.25  # valhalla.py:11-13
MAXIMUM_SPEED = 160.0  # valhalla.py:14


def density_class_col(density: F.Column) -> F.Column:
    return (
        F.when(density < 5, "rural").when(density < 11, "suburban").otherwise("urban")
    )


def edge_type_col(use: F.Column, roundabout: F.Column, sign_cnt: F.Column) -> F.Column:
    return (
        F.when(use == "driveway", "driveway")
        .when(use == "alley", "alley")
        .when(use == "parking_aisle", "parking_aisle")
        .when(use == "drive_through", "drive-through")
        .when(roundabout, "roundabout")
        .when(use.isin("ramp", "turn_channel"),
              F.when(sign_cnt > 0, "link_exiting").otherwise("link_turning"))
        .otherwise("way")
    )


def derive_measurements(
    traversals: DataFrame,
    edges: DataFrame,
    keep_edge_id: bool = False,
    keep_seq: bool = False,
) -> DataFrame:
    """traversals (matcher output) + edges attrs ->
    measurements(country, region, density, road_class, type[, hour], kph).

    ``keep_edge_id`` adds (doc_id, edge_id) for accuracy evaluation against
    ground truth; the production fact table omits them (reference D6 shape).

    When the traversals carry ``t0`` (doc start epoch — the matcher emits
    it), each measurement also gets ``hour`` = UTC hour-of-day at edge
    ENTRY (t0 + prev elapsed), the north-star per-hour histogram dimension;
    pass ``extra_keys=["hour"]`` to ``rollup_medians`` to use it.

    The edges join is LEFT so a traversal whose edge_id is missing from the
    edges table still participates in the M4 abort scan (dt < 0 aborts the
    doc regardless of attribute availability — an inner join would silently
    remove the row BEFORE the violation check); rows without attributes
    can't produce a measurement and are dropped at the end.
    """
    # M1 — unmatched-ratio doc filter
    ok = traversals.where(
        F.col("n_unmatched") / F.col("n_points") <= MAXIMUM_UNMATCHED_PERCENTAGE
    )

    w = Window.partitionBy("doc_id").orderBy("edge_seq")
    n = ok.withColumn("n_edges", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    # prefix max of elapsed_time over all PRECEDING traversals (incl. edge 0)
    prev = F.max("elapsed_time").over(w.rowsBetween(Window.unboundedPreceding, -1))
    n = n.withColumn("prev_t", prev)

    # M2 — interior edges only (first & last trimmed)
    interior = n.where((F.col("edge_seq") > 0) & (F.col("edge_seq") < F.col("n_edges") - 1))

    j = interior.join(
        edges.select(
            "edge_id", "length_km", "density", "road_class", "use",
            "roundabout", "sign_cnt", "country", "region",
        ),
        "edge_id",
        "left",
    )
    j = j.withColumn("dt", F.col("elapsed_time") - F.col("prev_t"))
    j = j.withColumn(
        "kph", F.when(F.col("dt") > 0, F.col("length_km") / F.col("dt") * 3600.0)
    )

    # M4 + M7 — first violation aborts the rest of the doc (rows before kept)
    viol = F.when(
        (F.col("dt") < 0) | ((F.col("dt") > 0) & (F.col("kph") > MAXIMUM_SPEED)),
        F.col("edge_seq"),
    )
    wdoc = Window.partitionBy("doc_id")
    j = j.withColumn("abort_seq", F.min(viol).over(wdoc))
    kept = j.where(
        (F.col("abort_seq").isNull() | (F.col("edge_seq") < F.col("abort_seq")))
        & (F.col("dt") > 0)  # M5: zero-dt edges skipped (prev via prefix-max)
        & F.col("length_km").isNotNull()  # attr-less edges emit nothing
    )

    # M8-M12 — classification + admin columns
    extra = ["doc_id", "edge_id"] if keep_edge_id else []
    if keep_seq:
        extra.append("edge_seq")
    hour_cols = []
    if "t0" in traversals.columns:
        hour_cols = [
            F.floor(F.pmod(F.col("t0") + F.col("prev_t"), F.lit(86400.0)) / 3600.0)
            .cast("int")
            .alias("hour")
        ]
    return kept.select(
        *extra,
        "country",
        "region",
        density_class_col(F.col("density")).alias("density"),
        F.when(F.col("road_class") == "service_other", "service")
        .otherwise(F.col("road_class"))
        .alias("road_class"),
        edge_type_col(F.col("use"), F.col("roundabout"), F.col("sign_cnt")).alias("type"),
        *hour_cols,
        F.col("kph"),
    )
