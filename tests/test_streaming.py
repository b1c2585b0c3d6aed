"""Structured Streaming: stateless trace-accept equals the batch operator;
watermarked windowed counts equal the batch aggregation."""

import os
import shutil

from pyspark.sql import functions as F

from conflation_spark.operators.trace_filter import accepted_doc_ids
from conflation_spark.sources.spans import decode_points, load_documents
from conflation_spark.streaming.ingest import (
    doc_accept_stateless,
    stream_events,
    streaming_trace_accept,
    windowed_event_counts,
)


def test_stateless_accept_equals_batch(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    got = {
        r["doc_id"] for r in doc_accept_stateless(docs).where("accept").collect()
    }
    want = {r["doc_id"] for r in accepted_doc_ids(decode_points(docs)).collect()}
    assert got == want


def test_streaming_trace_accept_available_now(spark, fixture_dir, tmp_path):
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    shutil.copy(f"{fixture_dir}/documents.parquet", f"{src}/part0.parquet")
    out = streaming_trace_accept(spark, src)
    q = (
        out.writeStream.format("memory")
        .queryName("accepts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]
        for r in spark.sql("select doc_id from accepts where accept").collect()
    }
    docs = load_documents(spark, fixture_dir)
    want = {r["doc_id"] for r in accepted_doc_ids(decode_points(docs)).collect()}
    assert got == want


def test_windowed_event_counts_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.repartition(3).write.parquet(src)

    streamed = stream_events(spark, src, window="1 minute")
    q = (
        streamed.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from wincounts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    # append-mode stream emits only windows sealed by the watermark; every
    # emitted window must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v
    # and the max event time seals all but the trailing watermark's windows
    assert len(got) >= len(want) - 3
