"""Span decode + round-trip invariant (input_hint: span-sequence equality
on (kind, text, media_ref, order) per row)."""

from pyspark.sql import functions as F

from conflation_spark.sources.spans import (
    decode_points,
    load_documents,
    reencode_spans,
    span_fingerprint,
)


def test_roundtrip_span_sequence_equality(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    rt = reencode_spans(docs)
    joined = docs.alias("a").join(rt.alias("b"), "doc_id")
    mismatches = joined.where(F.col("a.spans") != F.col("b.spans")).count()
    assert mismatches == 0
    assert rt.count() == docs.count()


def test_decode_points_matches_oracle(spark, fixture_dir):
    from tests.oracle import decode_doc

    docs = load_documents(spark, fixture_dir)
    pts = decode_points(docs)
    got = {
        (r["doc_id"], r["offset"]): (r["time"], r["lon"], r["lat"])
        for r in pts.collect()
    }
    want = {}
    for row in docs.collect():
        spans = sorted(
            [s.asDict() for s in row["spans"]], key=lambda s: s["offset"]
        )
        for s in spans:
            if s["kind"] == "gps":
                import json

                p = json.loads(s["text"])
                want[(row["doc_id"], s["offset"])] = (p["time"], p["lon"], p["lat"])
    assert got == want


def test_span_fingerprint_stable(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    fp1 = {r["doc_id"]: r["span_md5"] for r in span_fingerprint(docs).collect()}
    # repartitioning must not change the fingerprint (order carried by offset)
    fp2 = {
        r["doc_id"]: r["span_md5"]
        for r in span_fingerprint(docs.repartition(7)).collect()
    }
    assert fp1 == fp2
