"""Mergeable profiling sketches: KMV distinct-count + fixed-grid quantile
histogram.

A 100-TB profiling pass can't afford exact `countDistinct` / exact
`percentile` per dimension slice — it wants small, MERGEABLE summaries
computed in one scan and combined across partitions/days/tables. The two
sketches here are chosen for being fully DETERMINISTIC (pure functions of
the data via a content hash / a fixed bin grid), so unlike HLL or KLL —
whose estimates depend on implementation-private hashing and compaction
randomness — every number has an exact DuckDB twin and sits under the
repo's oracle gate. The reference has no analog (its aggregation is exact
medians over modest data, conflation/aggregation.py); this is a
scale-tier extension.

KMV (K-Minimum-Values, Bar-Yossef et al. 2002): keep the k smallest
DISTINCT 52-bit hashes of the key; if fewer than k exist the count is
exact, else estimate (k-1) / R(h_k) with R the hash normalized to [0,1).
Relative error ~ 1/sqrt(k-2) (k=1024 -> ~3%). The sketch is a sorted
array of longs; merging = union + keep k smallest — associative and
commutative, so partial sketches from any partitioning combine exactly.

Quantile histogram: counts over a FIXED equi-width grid on [lo, hi).
Merging = per-bin addition. Quantile estimates interpolate linearly
inside the covering bin — error bounded by one bin width, the honest
tradeoff stated up front (for heavy-tailed data pick log-spaced bounds or
more bins). Spark's approx_percentile is neither deterministic across
partitionings nor mergeable across separate jobs; exact percentile stays
available where the reference semantics require it (rollup.py).

Scale shape: both sketches are one hash-partitioned aggregation; the KMV
bottom-k plans as TakeOrdered globally or, per group, a salted two-level
bottom-k (partial k-smallest per (group, salt) slice, bounded merge) so a
hot group never funnels through one sorting task; no driver-side data
beyond the k-element summaries themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_HASH_SPACE = float(2**52)  # 13 hex chars of md5 -> [0, 2^52), exact in a double
KMV_SALT_PARTS = 32  # parallelism of the per-group partial bottom-k


def _grouped_bottom_k(
    rows: DataFrame, group_cols: list[str], k: int, salt_parts: int = KMV_SALT_PARTS
) -> DataFrame:
    """Skew-safe per-group bottom-k over (group cols, ``_h``) rows whose
    ``_h`` values are already distinct within each group.

    A single ``row_number`` window over the group would sort ALL of a hot
    group's hashes in one task — the single-task trap. Instead: salt on
    ``xxhash64(_h)`` so each (group, salt) slice keeps its own k smallest
    (the window sort spills, and each slice holds ~1/salt_parts of the
    group), then one bounded final merge per group over at most
    salt_parts*k surviving rows (the ``collect_list`` buffer is bounded
    by construction, not by luck). Exact: the k smallest of the union are
    all among the per-slice k smallest."""
    salted = rows.withColumn("_salt", F.pmod(F.xxhash64("_h"), F.lit(salt_parts)))
    w = Window.partitionBy(*group_cols, "_salt").orderBy("_h")
    part = salted.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return part.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_list("_h")), 1, k).alias("sketch")
    )


def kmv_hash(key: Column) -> Column:
    """52-bit content hash of the key (md5 prefix), the same
    hex-prefix-as-integer construction the sampling operators use —
    reproducible in any engine with md5 (DuckDB: CAST('0x'||substr(md5(k),
    1,13) AS BIGINT))."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10).cast("long")


def _estimate(sketch: Column, k: int) -> Column:
    """Distinct-count estimate from a sorted bottom-k hash array: exact
    size when under-full, else the KMV estimator (k-1)/R(h_k),
    integerized half-up so both engines emit identical longs."""
    n = F.size(sketch)
    kth = sketch[n - 1].cast("double")
    est = F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / (kth + F.lit(1.0))
    return F.when(n < k, n.cast("long")).otherwise(
        F.floor(est + F.lit(0.5)).cast("long")
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    k: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Bottom-k distinct-hash sketch of ``key_col`` (per group when
    ``group_cols`` given). Output: group cols + ``sketch``
    (sorted array<long> of the <=k smallest distinct hashes) +
    ``n_retained`` + ``est_distinct``.

    Plan: one distinct over (group, hash), then a global TakeOrdered (no
    groups) or the salted two-level bottom-k (``_grouped_bottom_k``) —
    no task ever sorts a whole hot group, and the final per-group merge
    touches at most salt_parts*k rows.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from conflation_spark.operators.spread import spread_scan

    # the md5 hashing is the per-row cost; spread a sub-split-size scan
    # so it is not serialized into a handful of scan tasks (no-op on
    # real multi-file tables)
    df = spread_scan(df)
    h = kmv_hash(F.col(key_col))
    if group_cols:
        base = df.select(*group_cols, h.alias("_h")).distinct()
        sk = _grouped_bottom_k(base, group_cols, k)
        out_keys = list(group_cols)
    else:
        base = df.select(h.alias("_h")).distinct()
        bott = base.orderBy("_h").limit(k)  # plans as TakeOrdered
        sk = bott.agg(F.sort_array(F.collect_list("_h")).alias("sketch"))
        out_keys = []
    return sk.select(
        *out_keys,
        "sketch",
        F.size("sketch").cast("long").alias("n_retained"),
        _estimate(F.col("sketch"), k).alias("est_distinct"),
    )


def kmv_merge(sketches: DataFrame, k: int, group_cols: list[str] | None = None) -> DataFrame:
    """Merge partial KMV sketches (rows with a ``sketch`` array column):
    union the hash sets, keep the k smallest per group. Associative and
    exact — merging per-partition/per-day sketches equals sketching the
    union (tested), which is what makes the summary reusable across jobs."""
    ex = sketches.select(*(group_cols or []), F.explode("sketch").alias("_h")).distinct()
    if group_cols:
        sk = _grouped_bottom_k(ex, group_cols, k)
    else:
        bott = ex.orderBy("_h").limit(k)
        sk = bott.agg(F.sort_array(F.collect_list("_h")).alias("sketch"))
    return sk.select(
        *(group_cols or []),
        "sketch",
        F.size("sketch").cast("long").alias("n_retained"),
        _estimate(F.col("sketch"), k).alias("est_distinct"),
    )


def quantile_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-grid histogram sketch: one row per (group, bin) with the
    count of values whose bin is clamp(floor((x-lo)/(hi-lo)*n_bins)) into
    [0, n_bins-1] (values outside [lo, hi) land in the edge bins, never
    dropped). Mergeable by adding counts bin-wise. One shuffle (the
    groupBy); the grid is part of the sketch identity — only merge
    histograms built with the same (lo, hi, n_bins)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n_bins)))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        df.where(x.isNotNull())
        .groupBy(*(group_cols or []), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantile(
    hist: DataFrame,
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_cols: list[str] | None = None,
    out_col: str = "q_value",
) -> DataFrame:
    """Quantile estimate from a histogram sketch: find the bin where the
    running count first reaches q*total and interpolate linearly inside
    it. Deterministic arithmetic on counts -> exact DuckDB twin; error is
    bounded by one bin width by construction."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    width = (hi - lo) / n_bins
    gb = list(group_cols or [])
    w = (
        Window.partitionBy(*gb).orderBy("bin")
        if gb
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    cum = hist.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_tot", F.sum("n").over(Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1)))
    )
    target = F.lit(q) * F.col("_tot")
    # first bin whose cumulative count reaches the target
    hit = cum.where(F.col("_cum") >= target).withColumn(
        "_rn",
        F.row_number().over(
            (Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1))).orderBy("bin")
        ),
    ).where(F.col("_rn") == 1)
    frac = (target - (F.col("_cum") - F.col("n"))) / F.col("n")
    val = F.lit(lo) + (F.col("bin").cast("double") + frac) * F.lit(width)
    return hit.select(*gb, val.alias(out_col))
