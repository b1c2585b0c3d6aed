"""Temporal joins for event streams: as-of join (+ lag-to-anchor).

The reference has no temporal-join operator (its pipeline is spatial), but
a training-data/event pipeline needs one constantly: attach the most recent
dimension state / anchor event at-or-before each fact row. Spark has no
built-in ASOF JOIN (DuckDB/pandas do), and the naive formulation —
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + a max-window — is a RANGE
join: Catalyst plans it as a broadcast-nested-loop or a per-key cartesian,
f^2 rows per hot key. The scale shape used here instead:

    UNION the two streams with a side marker
    -> ONE hash shuffle on the key
    -> ordered window (ts, side) carrying the last-seen right payload
       (``last(_rv, ignorenulls=True)``, running frame)
    -> keep left rows, unpack the carried payload

Cost: one shuffle + one in-partition sort of |L| + |R| rows, zero join
blowup, hot keys bounded by the window (linear scan), AQE-compatible.
Matches DuckDB ``ASOF LEFT JOIN`` semantics (greatest right.ts <= left.ts
per key, inclusive) — the correctness gate runs both side by side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "anchor_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same key (backward as-of, inclusive;
    LEFT semantics — left rows with no prior right row keep NULLs).

    ``right_cols``: right payload columns to carry (default: all non-key,
    non-ts columns), emitted as ``{prefix}{col}`` plus ``{prefix}ts``.

    Right rows must be unique per (key, ts) — the standard as-of contract
    (DuckDB raises the same requirement for a deterministic result).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(key_cols) | {right_ts}
    ]
    out_names = [f"{prefix}{right_ts}", *[f"{prefix}{c}" for c in right_cols]]
    clash = sorted(set(out_names) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join output column(s) {clash} collide with left columns; "
            f"pass a different prefix (got {prefix!r})"
        )
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"asof_join would emit duplicate output column(s) {dupes}; "
            "drop the duplicate from right_cols"
        )
    payload = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts (inclusive)
        payload.alias("_rv"),
    )
    # left rows ride through the same union with their payload packed into
    # a struct, so the window pass reconstructs full left rows afterwards
    l_cols = list(left.columns)
    lu = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_lv"),
    )
    ru = r.withColumn("_lv", F.lit(None).cast(lu.schema["_lv"].dataType)).select(
        lu.columns
    )
    u = ru.unionByName(lu)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_cr", F.last("_rv", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"_lv.{c}").alias(c) for c in l_cols],
        F.col("_cr._rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_cr.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    right_cols: list[str] | None = None,
    prefix: str = "iv_",
    how: str = "inner",
) -> DataFrame:
    """Attach the interval [start, end] (inclusive bounds) covering each
    left row — the SCD-2 / validity-period dimension lookup. CONTRACT:
    intervals are non-overlapping per key (dimension versions, sessions);
    under it the covering interval is exactly the as-of match on
    ``start``, so this is the same union + one keyed shuffle + running
    window — never the quadratic per-key theta-join Catalyst would plan
    for ``l.ts BETWEEN r.start AND r.end`` (BroadcastNestedLoop / per-key
    cartesian). ``how``: 'inner' drops uncovered rows, 'left' keeps them
    with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in set(key_cols) | {start_col, end_col}
    ]
    j = asof_join(left, right, key_cols, left_ts, start_col, [end_col, *right_cols], prefix)
    covered = F.col(left_ts) <= F.col(f"{prefix}{end_col}")
    if how == "inner":
        return j.where(covered)
    iv_cols = [f"{prefix}{c}" for c in (start_col, end_col, *right_cols)]
    return j.select(
        *[c for c in j.columns if c not in iv_cols],
        *[F.when(covered, F.col(c)).alias(c) for c in iv_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: float = 3600.0,
    right_cols: list[str] | None = None,
    prefix: str = "rj_",
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """General range join — left rows against possibly OVERLAPPING
    intervals (inclusive bounds), emitting one row per (left row,
    covering interval). ``left_ts``/``start_col``/``end_col`` are numeric
    (e.g. epoch seconds).

    Scale shape: Catalyst plans ``l.ts BETWEEN r.start AND r.end`` as a
    broadcast-nested-loop / per-key cartesian (quadratic at hot keys).
    Instead each interval EXPLODES into the coarse time buckets it
    touches (floor(t / bucket_width)) and the join becomes a hash
    equi-join on (key..., bucket) + the exact BETWEEN residual. A left
    row matches each interval in exactly ONE bucket (its own), so no
    post-join dedup is needed. Pick ``bucket_width`` near the typical
    interval length: cost ~ |L| + |R| * (len/width + 1) exploded rows.
    ``max_buckets_per_interval`` fails fast on intervals that would
    explode past the cap (a year-long interval at 1s buckets is a config
    error, not a workload). The cap check lives INSIDE the exploding
    projection (``assert_true`` guarding the sequence bound), so the
    builder stays fully lazy and ``right`` is scanned exactly once — at
    the join — instead of an extra eager guard pass per call.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(key_cols) | {start_col, end_col}
    ]
    b0 = F.floor(F.col(start_col) / bucket_width).cast("long")
    b1 = F.floor(F.col(end_col) / bucket_width).cast("long")
    # null-safe: a NULL start/end must keep sequence()'s null-drop
    # semantics (the row vanishes at explode), not trip assert_true —
    # assert_true throws on NULL conditions, so OR the null cases in
    guard = F.assert_true(
        F.col(start_col).isNull()
        | F.col(end_col).isNull()
        | (b1 - b0 + 1 <= F.lit(max_buckets_per_interval)),
        F.lit(
            f"an interval spans more than {max_buckets_per_interval} buckets "
            f"of width {bucket_width}; raise bucket_width or the cap"
        ),
    )
    # assert_true yields NULL when the predicate holds; wiring it into the
    # sequence's upper bound keeps it un-prunable and evaluated per row
    b1_checked = F.when(guard.isNull(), b1)
    r = right.select(
        *key_cols,
        F.col(start_col).alias(f"{prefix}{start_col}"),
        F.col(end_col).alias(f"{prefix}{end_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.explode(F.sequence(b0, b1_checked)).alias("_bucket"),
    )
    lt = left.withColumn(
        "_bucket", F.floor(F.col(left_ts) / bucket_width).cast("long")
    )
    # guide §3.1: the exploding Generate defeats size estimation and the
    # planner has been observed broadcasting the FULL left/events side
    # instead; a shuffled-hash join on (key, bucket) with the interval
    # side as build is the scale-safe shape (per-partition build, big
    # side streams)
    out = lt.join(r.hint("shuffle_hash"), [*key_cols, "_bucket"]).where(
        (F.col(left_ts) >= F.col(f"{prefix}{start_col}"))
        & (F.col(left_ts) <= F.col(f"{prefix}{end_col}"))
    )
    return out.drop("_bucket")


def asof_lag(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "anchor_",
    lag_col: str = "lag_s",
) -> DataFrame:
    """asof_join + seconds-since-anchor (NULL when no anchor)."""
    j = asof_join(left, right, key_cols, left_ts, right_ts, right_cols, prefix)
    return j.withColumn(
        lag_col,
        F.col(left_ts).cast("timestamp").cast("double")
        - F.col(f"{prefix}{right_ts}").cast("timestamp").cast("double"),
    )
