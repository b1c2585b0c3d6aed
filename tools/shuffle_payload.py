"""Measure the matcher's candidate-stream payload: round-2 flat rows vs
round-3 one-row-per-point struct arrays.

The traversal stage is memory-bandwidth bound (BENCH_NOTES), and its two
big byte movers are the in-partition sort and the Arrow transfer into the
Python kernel. Both are proportional to the serialized candidate-stream
size, which this tool measures directly as Arrow bytes (`Table.nbytes` —
exactly the representation `mapInArrow` streams).

Usage: python tools/shuffle_payload.py [sf0.1]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(sf: str = "sf0.1") -> None:
    from pyspark.sql import functions as F

    from conflation_spark.datagen import ensure_fixture
    from conflation_spark.operators.candidates import candidate_edges
    from conflation_spark.operators.matching import CAND_STRUCT_FIELDS
    from conflation_spark.operators.trace_filter import filter_traces
    from conflation_spark.session import get_spark
    from conflation_spark.sources.spans import decode_points, load_documents

    spark = get_spark("payload", master="local[16]", shuffle_partitions=16)
    fx = ensure_fixture(sf)
    pts = filter_traces(
        decode_points(load_documents(spark, fx)).select(
            "doc_id", "offset", "time", "lon", "lat"
        )
    ).cache()
    pts.count()
    cand = candidate_edges(pts, spark.read.parquet(f"{fx}/edges.parquet"))

    # round-2 shape: one row per (point, candidate), point attrs duplicated
    flat = cand.select(
        "doc_id", "gps_idx", "time", "lon", "lat",
        "edge_id", "src", "dst", "dist_m", "t_param", "len_m",
    )
    flat_tbl = flat.toArrow()

    # round-3 shape: one row per point, candidates as a sorted struct array,
    # gc_prev instead of (lon, lat)
    cand_struct = F.struct(*[F.col(f) for f in CAND_STRUCT_FIELDS])
    pp = (
        cand.select(
            "doc_id", "gps_idx", "time", "gc_prev",
            "edge_id", "src", "dst", "dist_m", "t_param", "len_m",
        )
        .groupBy("doc_id", "gps_idx")
        .agg(
            F.first("time").alias("time"),
            F.first("gc_prev").alias("gc_prev"),
            F.array_sort(F.collect_list(cand_struct)).alias("cands"),
        )
    )
    pp_tbl = pp.toArrow()

    fb, pb = flat_tbl.nbytes, pp_tbl.nbytes
    print(f"flat rows:      {flat_tbl.num_rows:>9,}  {fb/1e6:8.1f} MB Arrow")
    print(f"per-point rows: {pp_tbl.num_rows:>9,}  {pb/1e6:8.1f} MB Arrow")
    print(f"payload reduction through sort + Python boundary: {(1 - pb/fb)*100:.1f}%")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf0.1")
