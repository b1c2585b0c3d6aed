"""Interleaved-span document source: decode GPS spans into a typed points table.

Input (BASELINE.json input_hint / FIXTURES.md §1):
    documents(doc_id: string,
              spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

``kind='gps'`` spans carry the reference's trace-point contract in ``text``:
JSON ``{"time": <epoch s>, "lon": <deg>, "lat": <deg>}``
(/root/reference/conflation/trace_filter.py:31-33, built at
/root/reference/conflation/trace_fetching/mapillary.py:449-456).

All decoding is JVM-side: ``explode`` + ``from_json`` — no Python UDF.
Span order is carried by ``offset`` (the per-row invariant: span-sequence
equality on (kind, text, media_ref, order) — see ``reencode_spans`` which
reconstructs the exact spans array for the round-trip test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GPS_JSON_SCHEMA = "time double, lon double, lat double, radius double"


def load_documents(spark, source: str) -> DataFrame:
    """Load the documents table from a directory (parquet) or a catalog
    table identifier (``spark.read.table``).

    The table branch is the Iceberg seam (north_rule: Iceberg tables of
    interleaved docs): with the iceberg-spark runtime jars and a catalog
    configured, pass ``table:catalog.db.documents`` and the scan (incl.
    pushdown and partition pruning) goes through the Iceberg source — the
    container has no Iceberg jars, so CI covers the branch with temp views
    and skips the format-specific test (see tests/test_spans.py).

    Routing: an explicit ``table:`` prefix is a catalog identifier; a
    source containing a URI scheme (``s3://``, ``hdfs://``, ...) is ALWAYS
    a path — the driver-local filesystem can't see cluster storage, so the
    ``os.path.exists`` probe must not demote it to a table name (it would
    fail with a confusing table-not-found) — as is any existing local
    path; anything else is a catalog identifier. (Round-2 inferred from
    '/' which misread a relative dir like ``sf1`` as a table name;
    round-3 used bare ``os.path.exists`` which misrouted URI paths.)
    """
    import os

    if source.startswith("table:"):
        return spark.read.table(source[len("table:"):])
    if "://" in source or os.path.exists(source):
        return spark.read.parquet(os.path.join(source, "documents.parquet"))
    return spark.read.table(source)


def decode_points(documents: DataFrame) -> DataFrame:
    """documents -> points(doc_id, offset, media_ref, time, lon, lat, radius).

    Mirrors reference S5 (mapillary.py:417-463): each GPS span is one trace
    point; points are already offset-ordered within a doc (the reference
    sorts by captured_at before emitting, mapillary.py:458-459 — our
    generator preserves that invariant, so ordering by ``offset`` == ordering
    by time for well-formed docs, while defective docs keep their defects).
    """
    sp = documents.select("doc_id", F.explode("spans").alias("s"))
    gps = sp.where(F.col("s.kind") == "gps")
    parsed = gps.select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.media_ref").alias("media_ref"),
        F.from_json(F.col("s.text"), GPS_JSON_SCHEMA).alias("p"),
    )
    return parsed.select(
        "doc_id",
        "offset",
        "media_ref",
        F.col("p.time").alias("time"),
        F.col("p.lon").alias("lon"),
        F.col("p.lat").alias("lat"),
        F.col("p.radius").alias("radius"),
    )


def reencode_spans(documents: DataFrame) -> DataFrame:
    """Round-trip: explode spans and reassemble the array ordered by offset.

    Used by the span-sequence-equality invariant test: the reassembled
    ``spans`` must equal the source array element-for-element on
    (kind, text, media_ref, offset).
    """
    exploded = documents.select("doc_id", F.explode("spans").alias("s"))
    return exploded.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("s.offset").alias("offset"),
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref"),
                )
            )
        ).alias("spans_sorted")
    ).select(
        "doc_id",
        F.transform(
            "spans_sorted",
            lambda x: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                x["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )


def span_fingerprint(documents: DataFrame) -> DataFrame:
    """Per-doc md5 over the ordered (kind, text, media_ref, offset) sequence.

    SQL-oracle-checkable form of the span-sequence invariant: DuckDB computes
    the same md5 over the same string_agg.
    """
    exploded = documents.select("doc_id", F.explode("spans").alias("s"))
    per_span = exploded.select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.concat_ws(
            "\x1f", F.col("s.kind"), F.col("s.text"), F.col("s.media_ref"), F.col("s.offset")
        ).alias("span_str"),
    )
    ordered = per_span.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                "\x1e",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("offset"), F.col("span_str")))
                    ),
                    lambda x: x["span_str"],
                ),
            )
        ).alias("span_md5")
    )
    return ordered
