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


def test_load_documents_table_identifier_branch(spark, fixture_dir):
    """Catalog-table branch of the Iceberg seam: a table identifier (no path
    separator) goes through spark.read.table. Covered with a temp view here;
    with Iceberg jars + a catalog the same call reads the Iceberg table."""
    from conflation_spark.sources.spans import decode_points, load_documents

    spark.read.parquet(f"{fixture_dir}/documents.parquet").createOrReplaceTempView(
        "docs_seam_view"
    )
    via_table = load_documents(spark, "docs_seam_view")
    via_path = load_documents(spark, fixture_dir)
    assert via_table.schema == via_path.schema
    assert decode_points(via_table).count() == decode_points(via_path).count()


def _has_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_load_documents_iceberg_format(spark, fixture_dir):
    """Format-specific Iceberg test: skipped without the iceberg-spark
    runtime jars (not shipped in this container — CLAUDE.md known gap)."""
    import pytest

    if not _has_iceberg(spark):
        pytest.skip("iceberg-spark runtime jars not on the classpath")
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", "/tmp/ice_warehouse")
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    docs.writeTo("ice.db.documents").createOrReplace()
    from conflation_spark.sources.spans import decode_points, load_documents

    assert decode_points(load_documents(spark, "ice.db.documents")).count() > 0


def test_load_documents_uri_scheme_routes_to_path(spark, fixture_dir):
    """A URI-scheme source (s3://, file://...) is a PATH even though the
    driver-local os.path.exists can't see it — it must never be demoted to
    a catalog identifier (ADVICE r3). file:// over the fixture proves the
    routing end-to-end; an s3:// path must fail with a filesystem error,
    not TABLE_OR_VIEW_NOT_FOUND."""
    import pytest

    from conflation_spark.sources.spans import load_documents

    docs = load_documents(spark, f"file://{fixture_dir}")
    assert docs.count() > 0
    with pytest.raises(Exception) as ei:
        load_documents(spark, "s3://no-such-bucket/prefix").count()
    assert "TABLE_OR_VIEW_NOT_FOUND" not in str(ei.value)
