"""Attribute the ~5% speed-bucket miss (bucket match 0.9502 since round 1).

Hypothesis from the within-10% rate (0.9992): the residual is boundary-time
estimation noise interacting with hard 10-km/h bucket edges, not a matcher
defect. This script separates the two:

1. Boundary-time error: join matched traversals to ground-truth enter/exit
   times and histogram (elapsed_time - true_exit).
2. Counterfactual: re-derive kph with the TRUE boundary times for exactly
   the traversals the matcher found — if bucket match goes to ~1.0, the
   whole miss is boundary estimation; whatever remains is matching.
3. Flip-margin analysis: given the observed kph error distribution, how many
   measurements sit close enough to a bucket edge that the error flips them?
   If predicted flips ~= observed misses, the residual is irreducible at
   this GPS noise level (sigma=4.5 m on ~2 s samples) without a different
   estimator.

Usage: python tools/accuracy_attribution.py [sf0.1]
Prints a summary; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(sf: str = "sf0.1") -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from conflation_spark.datagen import ensure_fixture
    from conflation_spark.operators.candidates import candidate_edges
    from conflation_spark.operators.matching import match_traces
    from conflation_spark.operators.trace_filter import filter_traces
    from conflation_spark.session import get_spark
    from conflation_spark.sources.spans import decode_points, load_documents

    spark = get_spark("accuracy", master="local[16]", shuffle_partitions=16)
    fx = ensure_fixture(sf)
    pts = filter_traces(
        decode_points(load_documents(spark, fx)).select(
            "doc_id", "offset", "time", "lon", "lat"
        )
    )
    edges = spark.read.parquet(f"{fx}/edges.parquet")
    trav = match_traces(pts, candidate_edges(pts, edges), num_partitions=16).cache()
    truth = spark.read.parquet(f"{fx}/truth.parquet")

    # 1:1 join on (doc, seq, edge): only traversals the matcher got right
    # positionally (seq identity is 1.0 at bench, so this is ~everything)
    j = trav.join(
        truth,
        (trav.doc_id == truth.doc_id)
        & (trav.edge_seq == truth.seq)
        & (trav.edge_id == truth.edge_id),
    ).select(
        trav.doc_id,
        trav.edge_seq,
        trav.edge_id,
        "elapsed_time",
        "enter_elapsed",
        "exit_elapsed",
    )
    ej = j.join(edges.select("edge_id", "length_km"), "edge_id").cache()
    n = ej.count()

    # (1) boundary-time error histogram
    be = ej.select((F.col("elapsed_time") - F.col("exit_elapsed")).alias("err"))
    qs = be.select(
        F.expr(
            "percentile(err, array(0.01,0.05,0.25,0.5,0.75,0.95,0.99))"
        ).alias("q"),
        F.avg(F.abs(F.col("err"))).alias("mae"),
        F.sqrt(F.avg(F.col("err") * F.col("err"))).alias("rmse"),
    ).collect()[0]
    print(f"n traversals joined to truth: {n}")
    print(
        "boundary err quantiles (s) p1/p5/p25/p50/p75/p95/p99:",
        [round(x, 4) for x in qs["q"]],
    )
    print(f"boundary err MAE {qs['mae']:.4f} s, RMSE {qs['rmse']:.4f} s")

    # (2) counterfactual: same interior-trim derivation, TRUE boundaries.
    # prev boundary = this traversal's enter == previous traversal's exit in
    # truth, so kph_true_bound = length / (exit - enter).
    w = F.col("exit_elapsed") - F.col("enter_elapsed")
    # derived kph from the MATCHER's boundaries (prefix-max prev like M5)
    from pyspark.sql import Window

    wdoc = Window.partitionBy(ej.doc_id).orderBy("edge_seq")
    prev = F.max("elapsed_time").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (
        ej.withColumn("prev_t", prev)
        .withColumn("n_edges", F.count(F.lit(1)).over(Window.partitionBy(ej.doc_id)))
        .where(
            (F.col("edge_seq") > 0) & (F.col("edge_seq") < F.col("n_edges") - 1)
        )
        .withColumn("dt", F.col("elapsed_time") - F.col("prev_t"))
        .where(F.col("dt") > 0)
        .select(
            (F.col("length_km") / F.col("dt") * 3600.0).alias("kph_est"),
            (F.col("length_km") / w * 3600.0).alias("kph_true_bound"),
        )
    )
    pdf = d.toPandas()
    est = pdf["kph_est"].to_numpy()
    tb = pdf["kph_true_bound"].to_numpy()
    bucket_est = np.floor(est / 10)
    bucket_tb = np.floor(tb / 10)
    print(f"\nn interior measurements: {len(pdf)}")
    print(
        "bucket match, matcher boundaries vs true-boundary kph:",
        round(float((bucket_est == bucket_tb).mean()), 4),
    )
    # if the matcher used TRUE boundaries the buckets would agree with the
    # true-boundary kph trivially (1.0) — so THIS number's complement is
    # exactly the boundary-estimation share of the miss.

    # (3) flip-margin: how many TRUE kph sit within the observed error of a
    # bucket edge? err_kph distribution -> predicted flip rate
    err_kph = est - tb
    dist_to_edge = np.minimum(tb % 10, 10 - (tb % 10))
    at_risk = float((np.abs(err_kph) > dist_to_edge).mean())
    obs_miss = float((bucket_est != bucket_tb).mean())
    print(f"kph err MAE {np.abs(err_kph).mean():.3f}, p95 {np.percentile(np.abs(err_kph), 95):.3f}")
    print(f"|err| exceeds margin-to-bucket-edge (at-risk rate): {at_risk:.4f}")
    print(f"at-risk / 2 (error sign is ~symmetric, half flip):  {at_risk / 2:.4f}")
    print(f"observed bucket misses:                             {obs_miss:.4f}")
    print(
        "\ninterpretation: an at-risk measurement flips its bucket only when "
        "the error points TOWARD the near edge (~half the time). at_risk/2 "
        "matching the observed miss rate means the bucket miss is FULLY "
        "explained by boundary-time noise against hard 10-km/h bucket "
        "edges — the matched edge sequence itself is exact (seq identity "
        "1.0) and no estimator using only the two straddling samples can "
        "remove GPS-projection noise from t_param."
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf0.1")
