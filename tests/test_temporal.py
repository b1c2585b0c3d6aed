"""As-of join: Spark union+window formulation vs the pandas merge_asof
oracle (backward, inclusive), including left rows with no anchor."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from conflation_spark.operators.temporal import asof_join, asof_lag, interval_join


def _mk(spark, seed=5):
    rng = np.random.default_rng(seed)
    n_l, n_r = 400, 60
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l),
            "user_id": rng.integers(0, 12, n_l),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="s"),
            "value": rng.random(n_l).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n_r),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="s"),
            "anchor_id": np.arange(n_r) + 1000,
        }
    ).drop_duplicates(["user_id", "ts"])  # as-of contract: unique (key, ts)
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _mk(spark)
    lsdf = spark.createDataFrame(left)
    rsdf = spark.createDataFrame(right)
    got = (
        asof_join(lsdf, rsdf, ["user_id"], "ts", "ts", ["anchor_id"])
        .orderBy("event_id")
        .toPandas()
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="user_id",
        direction="backward",  # inclusive, like DuckDB ASOF
        suffixes=("", "_r"),
    ).sort_values("event_id")
    assert len(got) == len(want) == len(left)
    g = got.set_index("event_id")
    w = want.set_index("event_id")
    ga = g["anchor_anchor_id"].astype("float64")
    wa = w["anchor_id"].astype("float64")
    assert ((ga == wa) | (ga.isna() & wa.isna())).all()
    # anchor_ts matches too where present
    gt = g["anchor_ts"]
    # reconstruct expected anchor ts by joining right on anchor_id
    rmap = right.set_index("anchor_id")["ts"]
    wt = wa.map(rmap)
    both = ~gt.isna()
    assert (gt[both].to_numpy() == wt[both].to_numpy()).all()
    assert gt.isna().equals(wa.isna())


def test_asof_lag_and_plan_shape(spark):
    left, right = _mk(spark, seed=9)
    lsdf = spark.createDataFrame(left)
    rsdf = spark.createDataFrame(right)
    j = asof_lag(lsdf, rsdf, ["user_id"], "ts", "ts", ["anchor_id"])
    rows = j.where(F.col("anchor_ts").isNotNull()).select("lag_s").collect()
    assert rows and all(r["lag_s"] >= 0 for r in rows)
    # plan: NO join node at all (the range-join blowup is the trap this
    # operator exists to avoid) — one exchange for the keyed window
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2  # key shuffle (+AQE coalesce variants)


def test_interval_join_inner_and_left(spark):
    """Non-overlapping validity intervals (SCD-2): inner drops uncovered
    rows, left nullifies; covering interval matches a brute-force check;
    the plan keeps the as-of shape (no Join node)."""
    left = spark.createDataFrame(
        [(i, "u1", float(t)) for i, t in enumerate([1, 5, 12, 20, 35, 99])],
        "event_id long, user_id string, ts double",
    )
    right = spark.createDataFrame(
        [("u1", 0.0, 10.0, "v1"), ("u1", 11.0, 30.0, "v2"), ("u1", 40.0, 50.0, "v3")],
        "user_id string, start double, end double, version string",
    )
    inner = interval_join(left, right, ["user_id"], "ts", "start", "end").collect()
    got = {r["event_id"]: r["iv_version"] for r in inner}
    assert got == {0: "v1", 1: "v1", 2: "v2", 3: "v2"}  # 35, 99 uncovered
    lft = interval_join(
        left, right, ["user_id"], "ts", "start", "end", how="left"
    )
    rows = {r["event_id"]: r for r in lft.collect()}
    assert len(rows) == 6
    assert rows[4]["iv_version"] is None and rows[4]["iv_start"] is None
    assert rows[0]["iv_version"] == "v1"
    plan = lft._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_range_join_bucketed_matches_bruteforce(spark):
    """Overlapping windows: bucketized equi-join + residual == brute-force
    nested loop, across bucket boundaries and exact endpoints."""
    from conflation_spark.operators.temporal import range_join_bucketed

    rng = np.random.default_rng(4)
    lrows = [(i, f"u{int(rng.integers(0, 5))}", float(rng.uniform(0, 1000)))
             for i in range(300)]
    rrows = []
    for j in range(60):
        s = float(rng.uniform(0, 950))
        rrows.append((f"u{int(rng.integers(0, 5))}", s, s + float(rng.uniform(5, 200)), j))
    # exact endpoint case
    lrows.append((999, "u0", 500.0))
    rrows.append(("u0", 400.0, 500.0, 999))
    left = spark.createDataFrame(lrows, "event_id long, user_id string, ts double")
    right = spark.createDataFrame(rrows, "user_id string, start double, end double, win long")
    got = {
        (r["event_id"], r["rj_win"])
        for r in range_join_bucketed(
            left, right, ["user_id"], "ts", "start", "end",
            bucket_width=100.0, right_cols=["win"],
        ).collect()
    }
    want = {
        (eid, wid)
        for eid, lu, t in lrows
        for wu, s, e, wid in rrows
        if lu == wu and s <= t <= e
    }
    assert got == want and (999, 999) in got


def test_range_join_bucket_cap_raises_lazily(spark):
    """The explosion cap is embedded in the plan (assert_true in the
    exploding projection): the builder stays action-free — no job runs at
    call time, `right` is scanned once — and an oversized interval still
    fails with the clear message on first action."""
    from pyspark.errors.exceptions.base import PySparkException

    from conflation_spark.operators.temporal import range_join_bucketed

    left = spark.createDataFrame([(1, "u", 5.0)], "event_id long, user_id string, ts double")
    right = spark.createDataFrame([("u", 0.0, 1e6, 1)], "user_id string, start double, end double, win long")
    import pytest

    # building is lazy — no error, no job
    j = range_join_bucketed(
        left, right, ["user_id"], "ts", "start", "end",
        bucket_width=1.0, right_cols=["win"], max_buckets_per_interval=100,
    )
    with pytest.raises(PySparkException, match="buckets"):
        j.count()


def test_range_join_null_interval_rows_drop_not_raise(spark):
    """A NULL start/end interval must keep sequence()'s null-drop
    semantics (the row vanishes), not trip the lazy assert_true guard —
    assert_true throws on a NULL condition, so the guard is made
    explicitly null-safe."""
    from conflation_spark.operators.temporal import range_join_bucketed

    left = spark.createDataFrame(
        [(1, "u", 5.0)], "event_id long, user_id string, ts double"
    )
    right = spark.createDataFrame(
        [("u", 0.0, 10.0, 1), ("u", None, 10.0, 2), ("u", 0.0, None, 3)],
        "user_id string, start double, end double, win long",
    )
    j = range_join_bucketed(
        left, right, ["user_id"], "ts", "start", "end",
        bucket_width=4.0, right_cols=["win"], max_buckets_per_interval=100,
    )
    assert [r.rj_win for r in j.collect()] == [1]


def test_range_join_scans_right_once(spark):
    """The lazy guard removed the eager count(): the physical plan must
    contain exactly one scan of the right side."""
    from conflation_spark.operators.temporal import range_join_bucketed

    left = spark.range(10).selectExpr("id as event_id", "'u' as user_id", "CAST(id AS DOUBLE) as ts")
    right = spark.createDataFrame(
        [("u", 0.0, 5.0, 1)], "user_id string, start double, end double, win long"
    )
    j = range_join_bucketed(
        left, right, ["user_id"], "ts", "start", "end",
        bucket_width=2.0, right_cols=["win"],
    )
    # the only RDD scan in the plan is the right side (left is Range);
    # exactly one — the old eager guard would have scanned right twice
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1, plan
    assert j.count() == 6  # ts 0..5 inclusive


def test_asof_join_rejects_output_name_collisions(spark):
    """Prefixed output names colliding with left columns must fail loudly
    (silent duplicate column names break downstream by-name access)."""
    import pytest

    from conflation_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u", 5.0, 9.9)], "event_id long, user_id string, ts double, anchor_ts double"
    )
    right = spark.createDataFrame([("u", 1.0, 7)], "user_id string, ts double, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["user_id"], "ts", "ts")
    # a non-colliding prefix works
    out = asof_join(left, right, ["user_id"], "ts", "ts", prefix="a2_")
    assert out.columns.count("anchor_ts") == 1 and "a2_ts" in out.columns
