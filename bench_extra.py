"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times each declared query in isolation with the same methodology as
bench.py (fn(spark, sf_dir).count(), min-of-k) and can additionally time a
noop-sink full materialization and dump .explain("formatted") to a plans
dir. bench.py stays the frozen measurement entry point; this file exists so
optimization work can be attributed per query without re-running the whole
pipeline bench.

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--repeats K]
                        [--noop] [--explain-dir plans/r06 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="", help="comma-separated subset; default all")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true", help="also time noop-sink materialization")
    ap.add_argument("--explain-dir", default="", help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="before", help="explain file suffix (before/after)")
    ap.add_argument("--no-warm", action="store_true", help="skip the worker warm-up")
    args = ap.parse_args()

    import __spark_entry__ as em
    from conflation_spark.datagen import ensure_fixture
    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.session import get_spark

    sf_name = os.path.basename(os.path.normpath(args.sf))
    spark = get_spark("bench_extra", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    ensure_fixture(sf_name if sf_name.startswith("sf") else "sf0.1")
    ensure_text_fixture(sf_name if sf_name.startswith("sf") else "sf0.1")

    qs = em.queries()
    names = [n for n in args.queries.split(",") if n] or list(qs)

    if not args.no_warm:
        # warm python workers + codegen paths the same way bench.py does
        from pyspark.sql import functions as F

        spark.range(args.cpus * 4).withColumn("g", F.pmod(F.col("id"), F.lit(64))).groupBy(
            "g"
        ).applyInPandas(lambda p: p.iloc[:1], schema="id long, g long").count()
        for n in names:
            try:
                qs[n](spark, args.sf).count()
            except Exception as e:  # surface, keep timing the rest
                print(f"WARM FAIL {n}: {e}", file=sys.stderr)

    out: dict[str, dict] = {}
    for n in names:
        fn = qs[n]
        rec: dict = {}
        times = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"count:{n}")
            t0 = time.time()
            fn(spark, args.sf).count()
            times.append(round(time.time() - t0, 3))
        rec["count_s"] = min(times)
        rec["count_runs"] = times
        if args.noop:
            times = []
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"noop:{n}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            rec["noop_s"] = min(times)
            rec["noop_runs"] = times
        spark.sparkContext.setJobDescription(None)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            p = os.path.join(args.explain_dir, f"{n}_{args.suffix}.txt")
            df = fn(spark, args.sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(p, "w") as f:
                f.write(plan)
        out[n] = rec
        print(json.dumps({n: rec}), flush=True)

    print(json.dumps({"summary": {n: r.get("count_s") for n, r in out.items()}}))


if __name__ == "__main__":
    main()
