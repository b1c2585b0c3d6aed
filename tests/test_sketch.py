"""KMV distinct-count + quantile-histogram sketch tests: exactness when
under-full, estimator accuracy, MERGE ASSOCIATIVITY (the property that
makes a sketch a sketch), and quantile error bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conflation_spark.operators.sketch import (
    histogram_quantile,
    kmv_merge,
    kmv_sketch,
    quantile_histogram,
)


def test_kmv_exact_when_underfull(spark):
    df = spark.createDataFrame([(f"k{i % 37}",) for i in range(500)], "key string")
    row = kmv_sketch(df, "key", k=64).collect()[0]
    assert row["n_retained"] == 37
    assert row["est_distinct"] == 37  # under-full -> exact
    assert list(row["sketch"]) == sorted(row["sketch"])


def test_kmv_estimate_accuracy(spark):
    """k=256 over 5000 distinct keys: relative error ~1/sqrt(k-2) (~6%);
    assert a generous 4-sigma band — the estimator is deterministic, so
    this is a fixed number, not a flaky draw."""
    n_distinct = 5000
    df = spark.createDataFrame([(f"key{i}",) for i in range(n_distinct)], "key string")
    row = kmv_sketch(df, "key", k=256).collect()[0]
    assert row["n_retained"] == 256
    assert abs(row["est_distinct"] - n_distinct) / n_distinct < 0.25


def test_kmv_merge_associativity(spark):
    """sketch(A | B) == merge(sketch(A), sketch(B)) EXACTLY — hash sets
    make the merge lossless up to the bottom-k cut, so partial sketches
    from any partitioning combine to the same summary."""
    a = spark.createDataFrame([(f"key{i}",) for i in range(0, 800)], "key string")
    b = spark.createDataFrame(
        [(f"key{i}",) for i in range(400, 1300)], "key string"  # overlaps a
    )
    k = 128
    full = kmv_sketch(a.unionByName(b), "key", k=k).collect()[0]
    merged = kmv_merge(
        kmv_sketch(a, "key", k=k).unionByName(kmv_sketch(b, "key", k=k)), k=k
    ).collect()[0]
    assert list(full["sketch"]) == list(merged["sketch"])
    assert full["est_distinct"] == merged["est_distinct"]
    assert full["n_retained"] == merged["n_retained"] == k


def test_kmv_per_group(spark):
    rows = [(f"g{i % 3}", f"u{i % (10 + (i % 3))}") for i in range(300)]
    df = spark.createDataFrame(rows, "g string, u string")
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
    }
    got = {r["g"]: r["est_distinct"] for r in kmv_sketch(df, "u", k=64, group_cols=["g"]).collect()}
    assert got == want  # all groups under-full -> exact


def test_kmv_grouped_hot_group_is_salted_and_exact(spark):
    """A hot group (one group holding ~all rows, overfull vs k) must (a)
    still produce the exact bottom-k sketch — salting is a physical
    re-arrangement, the k smallest of the union are among the per-slice
    k smallest — and (b) plan the per-group sort as salted windows:
    no Window partitioned on the group columns ALONE (the single-task
    full-group sort the salt exists to avoid)."""
    rows = [("hot", f"u{i}") for i in range(5000)] + [("cold", "x")]
    df = spark.createDataFrame(rows, "g string, u string")
    k = 32
    sk = kmv_sketch(df, "u", k=k, group_cols=["g"])
    got = {r["g"]: list(r["sketch"]) for r in sk.collect()}
    from conflation_spark.operators.sketch import kmv_hash

    hashes = sorted(
        r["_h"]
        for r in df.where(F.col("g") == "hot")
        .select(kmv_hash(F.col("u")).alias("_h"))
        .distinct()
        .collect()
    )
    assert got["hot"] == hashes[:k]
    assert len(got["cold"]) == 1
    plan = sk._jdf.queryExecution().executedPlan().toString()
    # every Window's partition spec must include the salt column
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_salt" in line, line


def test_kmv_rejects_tiny_k(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "key", k=1)


def test_histogram_counts_and_merge(spark):
    rng = np.random.default_rng(3)
    vals = rng.uniform(-10, 110, 2000).round(3)  # some outside [0, 100)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    h = quantile_histogram(df, "x", lo=0.0, hi=100.0, n_bins=20)
    got = {r["bin"]: r["n"] for r in h.collect()}
    bins = np.clip(np.floor(vals / 5.0), 0, 19).astype(int)
    want = dict(zip(*np.unique(bins, return_counts=True)))
    assert got == {int(k): int(v) for k, v in want.items()}
    # merge = bin-wise addition: two halves sum to the full histogram
    h1 = quantile_histogram(
        spark.createDataFrame([(float(v),) for v in vals[:1000]], "x double"),
        "x", 0.0, 100.0, 20,
    )
    h2 = quantile_histogram(
        spark.createDataFrame([(float(v),) for v in vals[1000:]], "x double"),
        "x", 0.0, 100.0, 20,
    )
    merged = {
        r["bin"]: r["n"]
        for r in h1.unionByName(h2).groupBy("bin").agg(F.sum("n").alias("n")).collect()
    }
    assert merged == got


def test_histogram_quantile_error_bound(spark):
    """Interpolated quantile lands within one bin width of the exact
    quantile, per construction, at several q levels and per group."""
    rng = np.random.default_rng(11)
    rows = []
    for g, scale in (("a", 40.0), ("b", 90.0)):
        for v in rng.uniform(0, scale, 3000):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, "g string, x double")
    n_bins, lo, hi = 50, 0.0, 100.0
    width = (hi - lo) / n_bins
    h = quantile_histogram(df, "x", lo, hi, n_bins, group_cols=["g"])
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "x"])
    for q in (0.1, 0.5, 0.95):
        got = {
            r["g"]: r["q_value"]
            for r in histogram_quantile(h, q, lo, hi, n_bins, group_cols=["g"]).collect()
        }
        for g in ("a", "b"):
            exact = float(pdf[pdf.g == g]["x"].quantile(q))
            assert abs(got[g] - exact) <= width + 1e-9, (g, q, got[g], exact)


def test_histogram_quantile_global_no_groups(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")
    got = histogram_quantile(
        quantile_histogram(df, "x", 0.0, 1000.0, 100), 0.5, 0.0, 1000.0, 100
    ).collect()
    assert len(got) == 1
    assert abs(got[0]["q_value"] - 500.0) <= 10.0 + 1e-9


def test_histogram_rejects_bad_bounds(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="hi > lo"):
        quantile_histogram(df, "x", 5.0, 5.0)
    with pytest.raises(ValueError, match="q must be"):
        histogram_quantile(quantile_histogram(df, "x", 0.0, 1.0), 1.5, 0.0, 1.0)
