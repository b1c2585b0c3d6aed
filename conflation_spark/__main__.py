"""spark-submit entrypoint: run the full conflation pipeline.

    spark-submit --py-files conflation_spark.zip -m conflation_spark \
        --input <fixture_or_table_dir> --work <work_dir> [--cpus N]

Local dev:  python -m conflation_spark --input fixtures/spatial/sf0.01 --work /tmp/run
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser(prog="conflation_spark")
    ap.add_argument("--input", required=True, help="dir with documents.parquet + edges.parquet")
    ap.add_argument("--work", required=True, help="work dir for checkpoints/lineage/results")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] (omit under spark-submit)")
    ap.add_argument("--zoom", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from conflation_spark.plans.pipeline import run_pipeline
    from conflation_spark.session import get_spark

    spark = get_spark(
        "conflation_pipeline",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    t0 = time.time()
    counts = run_pipeline(
        spark, args.input, args.work, zoom=args.zoom, resume=not args.no_resume
    )
    print(json.dumps({"rows": counts, "seconds": round(time.time() - t0, 2),
                      "config": f"{args.work}/results/config.json"}))


if __name__ == "__main__":
    main()
