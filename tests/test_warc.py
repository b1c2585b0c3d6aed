"""WARC source + HTML text extraction tests (sources/warc.py,
functions/html.py, datagen_warc.py)."""

import glob
import gzip
import hashlib
import os
import zlib

import numpy as np
import pytest

from conflation_spark.datagen_warc import gen_warc_fixture
from conflation_spark.functions.html import extract_text
from conflation_spark.sources.warc import (
    http_response_block,
    iter_warc_records,
    read_warc,
    warc_html_text,
    write_warc_gz,
)


def _mk_records():
    html = (
        b"<html><head><title>T &amp; t</title><script>drop()</script></head>"
        b"<body><p>alpha  beta</p><a href='/x'>gamma</a></body></html>"
    )
    return [
        dict(warc_type="warcinfo", record_id="<urn:uuid:1>",
             warc_date="2026-01-01T00:00:00Z", block=b"software: t\r\n"),
        dict(warc_type="request", record_id="<urn:uuid:2>", target_uri="http://e/a",
             warc_date="2026-01-01T00:00:00Z",
             block=b"GET /a HTTP/1.1\r\nHost: e\r\n\r\n"),
        dict(warc_type="response", record_id="<urn:uuid:3>", target_uri="http://e/a",
             warc_date="2026-01-01T00:00:00Z", block=http_response_block(html)),
        dict(warc_type="response", record_id="<urn:uuid:4>", target_uri="http://e/b",
             warc_date="2026-01-01T00:00:00Z",
             block=http_response_block(b"nf", 404, "text/plain")),
    ]


def test_writer_reader_roundtrip(tmp_path):
    p = str(tmp_path / "t.warc.gz")
    write_warc_gz(p, _mk_records())
    with open(p, "rb") as f:
        out = list(iter_warc_records(f))
    assert [r["warc_type"] for r in out] == ["warcinfo", "request", "response", "response"]
    assert out[2]["http_status"] == 200
    assert out[2]["http_content_type"].startswith("text/html")
    assert out[3]["http_status"] == 404
    text, title, n_links = extract_text(out[2]["payload"].decode())
    assert (text, title, n_links) == ("alpha beta gamma", "T & t", 1)


def test_single_member_gzip_layout(tmp_path):
    """A shard compressed as ONE gzip member (legal, non-CC layout) must
    parse identically to the member-per-record layout."""
    p = str(tmp_path / "multi.warc.gz")
    write_warc_gz(p, _mk_records())
    raw, data = b"", open(p, "rb").read()
    while data:
        z = zlib.decompressobj(wbits=31)
        raw += z.decompress(data)
        data = z.unused_data
    p1 = str(tmp_path / "single.warc.gz")
    with open(p1, "wb") as f:
        f.write(gzip.compress(raw, mtime=0))
    a = [r["record_id"] for r in iter_warc_records(open(p, "rb"))]
    b = [r["record_id"] for r in iter_warc_records(open(p1, "rb"))]
    assert a == b


def test_truncated_raises(tmp_path):
    p = str(tmp_path / "t.warc.gz")
    write_warc_gz(p, _mk_records())
    blob = open(p, "rb").read()
    # cut inside the last member: either a gzip error or a framing error
    with pytest.raises((ValueError, zlib.error, EOFError)):
        import io

        list(iter_warc_records(io.BytesIO(blob[: len(blob) - 20])))


def test_folded_header_and_missing_content_length(tmp_path):
    import io

    rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Record-ID: <urn:uuid:9>\r\n"
           b"X-Long: part one\r\n  part two\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    out = list(iter_warc_records(io.BytesIO(gzip.compress(rec, mtime=0))))
    assert out[0]["payload"] == b"hi"
    bad = b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\nx\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(io.BytesIO(gzip.compress(bad, mtime=0))))


def test_extract_text_malformed_recovers():
    text, title, n_links = extract_text("<p>one <b>two</p></b> three <a href=x>four")
    assert text == "one two three four"
    assert n_links == 1


def test_extract_text_block_vs_inline():
    """Block tags break text runs (browser semantics); inline tags do not."""
    assert extract_text("<p>a</p><p>b</p>")[0] == "a b"
    assert extract_text("x<b>y</b>z")[0] == "xyz"
    assert extract_text("three<a href=x>four</a>")[0] == "threefour"
    assert extract_text("one<br>two")[0] == "one two"


def test_fixture_truth_pure_python(tmp_path):
    """Every planted HTML page's (title, text_md5, n_links) is recovered
    through the full chain without Spark."""
    gen_warc_fixture(str(tmp_path), 60)
    import pyarrow.parquet as pq

    truth = pq.read_table(str(tmp_path / "warc_truth.parquet")).to_pydict()
    tmap = {rid: i for i, rid in enumerate(truth["record_id"])}
    seen = 0
    for shard in sorted(glob.glob(str(tmp_path / "*.warc.gz"))):
        for rec in iter_warc_records(open(shard, "rb")):
            if rec["warc_type"] != "response" or not rec[
                "http_content_type"
            ].startswith("text/html"):
                continue
            i = tmap[rec["record_id"]]
            text, title, n_links = extract_text(rec["payload"].decode())
            assert title == truth["title"][i]
            assert hashlib.md5(text.encode()).hexdigest() == truth["text_md5"][i]
            assert n_links == truth["n_links"][i]
            seen += 1
    assert seen == len(tmap) > 0


def test_read_warc_spark(spark, tmp_path):
    """Distributed scan: record counts and payloads survive the Arrow
    boundary; the type filter prunes in the kernel; text extraction
    matches the planted truth for every page."""
    gen_warc_fixture(str(tmp_path), 60)
    recs = read_warc(spark, str(tmp_path / "*.warc.gz"))
    by_type = {r["warc_type"]: r["n"] for r in
               recs.groupBy("warc_type").count().withColumnRenamed("count", "n").collect()}
    assert by_type["warcinfo"] == len(glob.glob(str(tmp_path / "*.warc.gz")))
    assert by_type["request"] == 60
    assert by_type["response"] == 60

    only_resp = read_warc(spark, str(tmp_path / "*.warc.gz"), record_types=("response",))
    assert only_resp.count() == 60
    assert only_resp.select("warc_type").distinct().collect()[0][0] == "response"

    txt = warc_html_text(only_resp)
    rows = {r["record_id"]: r for r in txt.collect()}
    import pyarrow.parquet as pq

    truth = pq.read_table(str(tmp_path / "warc_truth.parquet")).to_pydict()
    assert len(rows) == len(truth["record_id"])
    for i, rid in enumerate(truth["record_id"]):
        r = rows[rid]
        assert r["title"] == truth["title"][i]
        assert hashlib.md5(r["text"].encode()).hexdigest() == truth["text_md5"][i]
        assert r["n_links"] == truth["n_links"][i]
        assert r["target_uri"] == truth["url"][i]


def test_read_warc_one_task_per_shard(spark, tmp_path):
    """The scan's parallelism contract: the path list repartitions to one
    partition per shard (shards are non-splittable; parallelism = files)."""
    gen_warc_fixture(str(tmp_path), 240)  # 3 shards
    recs = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert recs.rdd.getNumPartitions() == len(glob.glob(str(tmp_path / "*.warc.gz")))


def test_stream_warc_records_parity_and_exactly_once(spark, tmp_path):
    """Streaming ingestion (sources/warc.stream_warc_records): shards
    landing in the drop dir are processed exactly once across query
    restarts (checkpointed file source), and the record set per shard
    equals the batch scan's."""
    import shutil

    from conflation_spark.sources.warc import stream_warc_records

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    gen_warc_fixture(stage, 160)  # 2 shards
    shards = sorted(glob.glob(f"{stage}/*.warc.gz"))
    assert len(shards) == 2
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    ck = str(tmp_path / "ck")

    out = str(tmp_path / "out")

    def run():
        # file sink: the one OSS sink that supports checkpoint RECOVERY,
        # which is the property under test (memory sink refuses restarts)
        q = (
            stream_warc_records(spark, f"{drop}/*.warc.gz", record_types=("response",))
            .selectExpr("src_file", "record_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(240), "stream did not terminate"
        rows = spark.read.parquet(out).collect()
        pairs = [(r["src_file"], r["record_id"]) for r in rows]
        assert len(pairs) == len(set(pairs)), "a shard was reprocessed"
        return set(pairs)

    def batch_ids(path):
        return {
            (os.path.basename(path), r["record_id"])
            for r in read_warc(spark, path, record_types=("response",)).collect()
        }

    shutil.copy(shards[0], drop)
    got1 = run()
    assert got1 == batch_ids(shards[0])

    # second shard lands; the restarted query (same checkpoint) must
    # process ONLY it — the accumulated sink holds both shards once each
    shutil.copy(shards[1], drop)
    got2 = run()
    assert got2 == batch_ids(shards[0]) | batch_ids(shards[1])


def test_iter_warc_members_tile_and_fetch(tmp_path):
    """Member offsets tile the shard exactly; random access by (offset,
    clen) reproduces every streamed record."""
    from conflation_spark.sources.warc import fetch_warc_record, iter_warc_members

    p = str(tmp_path / "t.warc.gz")
    write_warc_gz(p, _mk_records())
    members = list(iter_warc_members(open(p, "rb")))
    assert members[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(members, members[1:]):
        assert o1 + l1 == o2
    assert members[-1][0] + members[-1][1] == os.path.getsize(p)
    streamed = list(iter_warc_records(open(p, "rb")))
    assert len(members) == len(streamed)
    for (off, ln, _), want in zip(members, streamed):
        assert fetch_warc_record(p, off, ln) == want


def test_warc_cdx_spark_index_and_random_access(spark, tmp_path):
    """The distributed CDX build indexes every record with a fetchable
    (offset, clen); a sample of fetches reproduces payload truth."""
    import pyarrow.parquet as pq

    from conflation_spark.sources.warc import fetch_warc_record, warc_cdx

    gen_warc_fixture(str(tmp_path), 160)
    cdx = warc_cdx(spark, str(tmp_path / "*.warc.gz")).collect()
    recs = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    assert len(cdx) == len(recs)
    assert all(r["rec_in_member"] == 0 for r in cdx)  # CC layout
    truth = pq.read_table(str(tmp_path / "warc_truth.parquet")).to_pydict()
    tset = dict(zip(truth["record_id"], truth["url"]))
    rows = [r for r in cdx if r["record_id"] in tset][:25]
    assert rows
    for r in rows:
        rec = fetch_warc_record(
            str(tmp_path / r["src_file"]), r["offset"], r["clen"]
        )
        assert rec["record_id"] == r["record_id"]
        assert rec["target_uri"] == tset[r["record_id"]]
        assert rec["http_status"] == 200
