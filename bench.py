"""Headline benchmark. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "throughput": {...}}

Runs the full spatial pipeline (documents -> decode -> filter -> match ->
measurements -> rollup/config) on the deterministic spatial fixture sized to
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), on
local[$SPARK_GRAFT_CPUS], plus the SQL-checkable operator queries.

Scaling evidence (north_rule: two cluster sizes): run
``python tools/scaling_bench.py`` which executes this pipeline at local[8]
and local[32] in separate JVMs and reports throughput + efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def F_mod_id():
    from pyspark.sql import functions as F

    return F.pmod(F.col("id"), F.lit(64))


def run_bench(sf_dir: str, cpus: int, quiet: bool = True, pipeline_only: bool = False) -> dict:
    from conflation_spark.datagen import ensure_fixture
    from conflation_spark.plans.pipeline import run_pipeline
    from conflation_spark.session import get_spark

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    fixture = ensure_fixture(sf_name if sf_name.startswith("sf") else "sf0.1")

    queries: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="bench_work_")
    try:
        # warm the JVM AND the Python/Arrow workers (excluded from timing):
        # local mode spawns one python worker per core on first use, each
        # importing pandas/numpy — several seconds that would otherwise be
        # charged to the first applyInPandas stage
        import pandas as _pd

        spark.range(cpus * 4).withColumn("g", F_mod_id()).groupBy("g").applyInPandas(
            lambda p: p.iloc[:1], schema="id long, g long"
        ).count()
        # ...and the C2-JIT / codegen / Arrow-writer paths of the REAL
        # operators: one throwaway pipeline at sf0.001 (~3 s). A fresh JVM
        # otherwise pays ~1 min of first-execution compilation inside the
        # timed sf1 run — fixed cost, not engine throughput (a cluster job
        # amortizes it over hours).
        warm_work = tempfile.mkdtemp(prefix="bench_warm_")
        try:
            run_pipeline(spark, ensure_fixture("sf0.001"), warm_work, resume=False)
        finally:
            shutil.rmtree(warm_work, ignore_errors=True)

        # pipeline e2e: min over 3 back-to-back runs. Single-host stage
        # times vary up to 2-4x with host interference (BENCH_NOTES.md
        # documents the campaign; r3's driver run had BOTH of its 2 runs
        # land in an interference window, so min-of-2 was not enough).
        # All raw values are reported (pipeline_runs_s) so a noisy run is
        # visible, not hidden, and stage_min_sum_s (sum of per-stage
        # minima) is reported alongside — robust to interference hitting
        # DIFFERENT stages in different runs. Each run uses a FRESH work
        # dir — no checkpoint reuse, the full compute repeats.
        from conflation_spark.plans.pipeline import STAGES, read_lineage

        e2e_runs: list[float] = []
        stage_runs: dict[str, list[float]] = {}
        skew: dict[str, float] = {}
        for _ in range(3):
            shutil.rmtree(work, ignore_errors=True)
            os.makedirs(work, exist_ok=True)
            t0 = time.time()
            counts = run_pipeline(spark, fixture, work, resume=False)
            e2e_runs.append(round(time.time() - t0, 3))
            for st in STAGES:
                man = read_lineage(work, st)
                stage_runs.setdefault(st, []).append(man["write_seconds"])
                skew[st] = man.get("skew_ratio", 1.0)
            rc = os.path.join(work, "lineage", "rollup_config.json")
            if os.path.exists(rc):
                with open(rc) as f:
                    stage_runs.setdefault("rollup_config", []).append(
                        json.load(f)["seconds"]
                    )
        queries["pipeline_e2e"] = min(e2e_runs)
        for st in STAGES:
            queries[f"stage_{st}_write_s"] = min(stage_runs[st])
        if "rollup_config" in stage_runs:
            queries["stage_rollup_config_s"] = min(stage_runs["rollup_config"])
        # sum of per-stage minima: the interference-robust e2e estimate
        # (stage timings cover the write path; the small residual is
        # driver-side planning + the final config build)
        queries["stage_min_sum_s"] = round(
            sum(min(v) for v in stage_runs.values()), 3
        )

        # operator queries (driver tables at sf_dir + spatial fixture)
        ann_recall: dict = {}
        if not pipeline_only:
            import __spark_entry__ as em

            # fixture generation is not query work: warm it outside the timers
            from conflation_spark.datagen_text import ensure_text_fixture

            ensure_text_fixture(sf_name if sf_name.startswith("sf") else "sf0.1")

            # min-of-2 per query: single-host interference inflates
            # individual timings 2-5x (documented in BENCH_NOTES); the min
            # of two back-to-back runs is the reportable number
            for name, fn in em.queries().items():
                best = None
                for _ in range(2):
                    t0 = time.time()
                    fn(spark, sf_dir).count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                queries[name] = round(best, 3)

        # ANN retrieval quality: recall@10 of the approximate methods vs the
        # exact brute-force ground truth on the same (corpus, probe set) —
        # hash-matching the DuckDB oracle proves determinism, recall is the
        # number an ANN user actually needs. Plus IVF n_probe sensitivity.
        if not pipeline_only:
            truth = em.queries()["ann_topk"](spark, sf_dir).cache()
            n_truth = truth.count()
            for name in ("ann_lsh_topk", "ann_ivf_topk"):
                got = em.queries()[name](spark, sf_dir)
                hit = got.join(truth, ["query_id", "neighbor_id"], "left_semi").count()
                ann_recall[f"{name}_recall_at_10"] = round(hit / max(n_truth, 1), 4)
            # n_probe curve for IVF (same centroids as the headline query)
            from pyspark.sql import functions as FF

            from conflation_spark.operators.similarity import ivf_topk

            cents = em._ivf_centroids(sf_dir)
            v = spark.read.parquet(f"{em._text_dir(sf_dir)}/vectors.parquet")
            q = v.orderBy("vec_id").limit(20).selectExpr("vec_id as query_id", "vec")
            curve = {}
            for n_probe in (1, 2, 4, 8):
                got = ivf_topk(
                    v, q, k=10, n_probe=n_probe, id_col="vec_id", vec_col="vec",
                    centroids=cents,
                )
                hit = got.join(truth, ["query_id", "neighbor_id"], "left_semi").count()
                curve[str(n_probe)] = round(hit / max(n_truth, 1), 4)
            ann_recall["ivf_recall_at_10_by_n_probe"] = curve
            truth.unpersist()

        # correctness metrics vs ground truth (BASELINE.json: per-edge
        # speed-bucket exact-match rate): re-derive measurements keeping
        # edge ids, join the fixture's true per-edge speeds, bucket at
        # 10 km/h, and compare; plus matched-edge-sequence identity.
        from pyspark.sql import functions as F

        from conflation_spark.operators.measurements import derive_measurements

        edges = spark.read.parquet(f"{fixture}/edges.parquet")
        trav = spark.read.parquet(os.path.join(work, "checkpoints", "traversals"))
        truth = spark.read.parquet(f"{fixture}/truth.parquet")
        # actual per-traversal speed from ground truth enter/exit times —
        # the engine's derived kph is scored against what the synthetic
        # vehicle actually drove on that edge (not the edge's nominal speed,
        # which the generator perturbs per traversal)
        actual = truth.join(edges.select("edge_id", "length_km"), "edge_id").select(
            "doc_id",
            F.col("seq").alias("edge_seq"),
            "edge_id",
            (
                F.col("length_km")
                / (F.col("exit_elapsed") - F.col("enter_elapsed"))
                * 3600.0
            ).alias("actual_kph"),
        )
        derived = derive_measurements(trav, edges, keep_edge_id=True, keep_seq=True)
        m = derived.join(actual, ["doc_id", "edge_seq", "edge_id"])
        bucket_stats = m.select(
            F.avg(
                (F.floor(F.col("kph") / 10) == F.floor(F.col("actual_kph") / 10)).cast("double")
            ).alias("bucket_match"),
            F.avg(
                (F.abs(F.col("kph") - F.col("actual_kph")) / F.col("actual_kph") <= 0.10).cast(
                    "double"
                )
            ).alias("within_10pct"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        seq_match = (
            trav.join(
                truth,
                (trav.doc_id == truth.doc_id)
                & (trav.edge_seq == truth.seq)
                & (trav.edge_id == truth.edge_id),
                "left_semi",
            ).count()
        )
        accuracy = {
            "speed_bucket_exact_match_rate": round(bucket_stats["bucket_match"], 4),
            "speed_within_10pct_rate": round(bucket_stats["within_10pct"], 4),
            "n_measurements_scored": bucket_stats["n"],
            "traversal_seq_identity_rate": round(seq_match / max(counts["traversals"], 1), 4),
        }

        n_docs = spark.read.parquet(f"{fixture}/documents.parquet").count()
        accepted_docs = (
            spark.read.parquet(os.path.join(work, "checkpoints", "filtered_points"))
            .select("doc_id")
            .distinct()
            .count()
        )
        total = queries["pipeline_e2e"]
        result = {
            "metric": "traces conflated/sec (full documents->config pipeline)",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf_name,
            "cpus": cpus,
            "pipeline_runs_s": e2e_runs,
            "stage_runs_s": stage_runs,
            "skew_ratio": skew,
            "ann_recall": ann_recall,
            "accuracy": accuracy,
            "throughput": {
                "docs_per_sec": round(n_docs / total, 2),
                "accepted_docs_per_sec": round(accepted_docs / total, 2),
                "points_per_sec": round(counts["filtered_points"] / total, 1),
                "n_docs": n_docs,
                "n_accepted_docs": accepted_docs,
                "rows": counts,
            },
        }
        return result
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
