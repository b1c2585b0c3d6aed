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

        t0 = time.time()
        counts = run_pipeline(spark, fixture, work, resume=False)
        queries["pipeline_e2e"] = round(time.time() - t0, 3)

        # per-stage timings from the lineage manifests
        from conflation_spark.plans.pipeline import STAGES, read_lineage

        for st in STAGES:
            queries[f"stage_{st}_write_s"] = read_lineage(work, st)["write_seconds"]

        # operator queries (driver tables at sf_dir + spatial fixture)
        if not pipeline_only:
            import __spark_entry__ as em

            for name, fn in em.queries().items():
                t0 = time.time()
                fn(spark, sf_dir).count()
                queries[name] = round(time.time() - t0, 3)

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
