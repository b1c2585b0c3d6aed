"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names).

Spatial queries run on this repo's deterministic seeded fixtures
(``conflation_spark.datagen.ensure_fixture``); their oracles read the same
parquet via ``read_parquet`` absolute paths. Driver-table queries run on the
pre-registered views directly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.01"


def _spatial_dir(sf_dir: str) -> str:
    from conflation_spark.datagen import ensure_fixture

    return ensure_fixture(_sf_name(sf_dir))


# ---------------------------------------------------------------------------
# entry: flagship — full minimum slice on the spatial fixture
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """documents -> decode spans -> trace filter -> rollup medians of the
    pre-matched measurements of accepted docs' world. Returns the 3-level
    rollup DataFrame (small, stable schema)."""
    from conflation_spark.operators.rollup import rollup_medians
    from conflation_spark.operators.trace_filter import filter_traces
    from conflation_spark.sources.spans import decode_points, load_documents

    d = _spatial_dir("/root/testdata/sf0.001")
    docs = load_documents(spark, d)
    pts = filter_traces(decode_points(docs))
    # flagship returns the rollup over the measurements table, proving the
    # whole minimum slice plans and runs; the matcher pipeline extends this.
    meas = spark.read.parquet(f"{d}/measurements.parquet")
    out = rollup_medians(meas).withColumn(
        "n_accepted_docs", F.lit(pts.select("doc_id").distinct().count()).cast("long")
    )
    return out


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

_HAVERSINE_SQL = (
    "2*asin(sqrt(pow(sin((radians(lat)-radians(p_lat))/2),2)"
    "+cos(radians(p_lat))*cos(radians(lat))"
    "*pow(sin((radians(lon)-radians(p_lon))/2),2)))*6378160"
)


def _duck_points_cte(d: str) -> str:
    return f"""
sp AS (
  SELECT doc_id, unnest(spans) AS s
  FROM read_parquet('{d}/documents.parquet')
),
pts AS (
  SELECT doc_id, s.offset AS off,
         CAST(json_extract(s.text, '$.time') AS DOUBLE) AS time,
         CAST(json_extract(s.text, '$.lon') AS DOUBLE) AS lon,
         CAST(json_extract(s.text, '$.lat') AS DOUBLE) AS lat
  FROM sp WHERE s.kind = 'gps'
),
pairs AS (
  SELECT doc_id, off, time, lon, lat,
         lag(time) OVER w AS p_time,
         lag(lon) OVER w AS p_lon,
         lag(lat) OVER w AS p_lat
  FROM pts WINDOW w AS (PARTITION BY doc_id ORDER BY off)
),
deltas AS (
  SELECT doc_id, off, time, lon, lat, p_time,
         time - p_time AS dt,
         {_HAVERSINE_SQL} AS d,
         CASE WHEN time - p_time <> 0
              THEN ({_HAVERSINE_SQL})/1000.0/(time - p_time)*3600.0 END AS v_kmph
  FROM pairs
),
stats AS (
  SELECT doc_id,
         count(*) AS n_points,
         max_by(time, off) - min_by(time, off) AS total_time,
         coalesce(sum(CASE WHEN dt IS NOT NULL AND dt <> 0 THEN d END), 0) AS total_dist,
         CAST(coalesce(sum(CASE WHEN dt > 5 THEN 1 ELSE 0 END
               + CASE WHEN dt IS NOT NULL AND dt <> 0 AND v_kmph > 160 THEN 1 ELSE 0 END), 0) AS BIGINT) AS num_poor,
         max(CASE WHEN dt < 0 THEN 1 ELSE 0 END) AS has_negative_dt,
         avg(CASE WHEN dt IS NOT NULL AND dt <> 0 THEN v_kmph END) AS mean_speed
  FROM deltas GROUP BY doc_id
)
"""


def _q_span_decode_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from conflation_spark.sources.spans import decode_points, load_documents

    d = _spatial_dir(sf_dir)
    pts = decode_points(load_documents(spark, d))
    return pts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_gps"),
        F.min("offset").cast("long").alias("min_off"),
        F.max("offset").cast("long").alias("max_off"),
    )


def _q_span_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from conflation_spark.sources.spans import load_documents, span_fingerprint

    return span_fingerprint(load_documents(spark, _spatial_dir(sf_dir)))


def _q_tf_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from conflation_spark.operators.trace_filter import doc_stats
    from conflation_spark.sources.spans import decode_points, load_documents

    d = _spatial_dir(sf_dir)
    s = doc_stats(decode_points(load_documents(spark, d)))
    return s.select(
        "doc_id",
        F.col("n_points").cast("long").alias("n_points"),
        F.round(F.col("total_time") * 1000).cast("long").alias("total_time_ms"),
        F.round(F.col("total_dist") * 10).cast("long").alias("total_dist_dm"),
        F.col("num_poor").cast("long").alias("num_poor"),
        F.col("has_negative_dt").cast("int").alias("has_negative_dt"),
        F.round(F.col("mean_speed") * 100).cast("long").alias("mean_speed_c"),
    )


def _q_tf_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from conflation_spark.operators.trace_filter import accepted_doc_ids
    from conflation_spark.sources.spans import decode_points, load_documents

    return accepted_doc_ids(decode_points(load_documents(spark, _spatial_dir(sf_dir))))


def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from conflation_spark.operators.rollup import rollup_medians

    d = _spatial_dir(sf_dir)
    meas = spark.read.parquet(f"{d}/measurements.parquet")
    r = rollup_medians(meas)
    return r.select(
        "level",
        F.coalesce("country", F.lit("~")).alias("country"),
        F.coalesce("region", F.lit("~")).alias("region"),
        "density",
        "road_class",
        "type",
        F.round(F.col("median_kph") * 100).cast("long").alias("median_kph_c"),
    )


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "span_decode_count": _q_span_decode_count,
        "span_fingerprint": _q_span_fingerprint,
        "tf_doc_stats": _q_tf_doc_stats,
        "tf_accepted_docs": _q_tf_accepted,
        "rollup_medians": _q_rollup,
        "tpch_q1": _q_tpch_q1,
    }


def oracle_sql() -> dict[str, str]:
    # oracles must resolve the same fixture dir the queries used at sf0.01
    d = _spatial_dir("/root/testdata/sf0.01")
    return {
        "span_decode_count": f"""
WITH sp AS (
  SELECT doc_id, unnest(spans) AS s
  FROM read_parquet('{d}/documents.parquet')
)
SELECT doc_id, count(*) AS n_gps,
       CAST(min(s.offset) AS BIGINT) AS min_off,
       CAST(max(s.offset) AS BIGINT) AS max_off
FROM sp WHERE s.kind = 'gps' GROUP BY doc_id
""",
        "span_fingerprint": f"""
WITH sp AS (
  SELECT doc_id, unnest(spans) AS s
  FROM read_parquet('{d}/documents.parquet')
)
SELECT doc_id,
       md5(string_agg(s.kind || chr(31) || s.text || chr(31) || s.media_ref || chr(31) || s.offset,
                      chr(30) ORDER BY s.offset)) AS span_md5
FROM sp GROUP BY doc_id
""",
        "tf_doc_stats": f"""
WITH {_duck_points_cte(d)}
SELECT doc_id, n_points,
       CAST(round(total_time * 1000) AS BIGINT) AS total_time_ms,
       CAST(round(total_dist * 10) AS BIGINT) AS total_dist_dm,
       num_poor,
       CAST(has_negative_dt AS INT) AS has_negative_dt,
       CAST(round(mean_speed * 100) AS BIGINT) AS mean_speed_c
FROM stats
""",
        "tf_accepted_docs": f"""
WITH {_duck_points_cte(d)}
SELECT doc_id FROM stats
WHERE total_time >= 55
  AND has_negative_dt = 0
  AND num_poor / n_points <= 0.25
  AND total_dist >= 1000
  AND (mean_speed IS NULL OR mean_speed >= 10)
""",
        "rollup_medians": f"""
WITH m AS (SELECT * FROM read_parquet('{d}/measurements.parquet')),
lvl AS (
  SELECT 'region' AS level, country, region, density, road_class, type,
         quantile_cont(kph, 0.5) AS med
  FROM m WHERE region <> '' GROUP BY country, region, density, road_class, type
  UNION ALL
  SELECT 'country', country, '~', density, road_class, type, quantile_cont(kph, 0.5)
  FROM m GROUP BY country, density, road_class, type
  UNION ALL
  SELECT 'world', '~', '~', density, road_class, type, quantile_cont(kph, 0.5)
  FROM m GROUP BY density, road_class, type
)
SELECT level, country, region, density, road_class, type,
       CAST(round(med * 100) AS BIGINT) AS median_kph_c
FROM lvl
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    }
