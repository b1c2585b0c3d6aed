"""WARC (ISO 28500) web-archive ingestion — the Common Crawl-shaped
source for the training-data pipeline operators.

The reference fetches its raw corpus over paginated HTTP APIs
(/root/reference/conflation/trace_fetching/mapillary.py:409-456); the
web-scale analog of that acquisition layer is WARC shards on object
storage, so this source closes the same gap Spark-first.

Format notes (what this implements):
- A ``.warc.gz`` shard is a CONCATENATION of gzip members. The Common
  Crawl convention compresses every record as its own member, which is
  what makes records recoverable from byte offsets; a whole shard
  compressed as one member is also legal and both layouts decode here
  (zlib ``decompressobj(wbits=31)`` restarted on ``unused_data``).
- A record = header lines (``WARC/1.0`` + ``Name: value``, CRLF) + blank
  line + ``Content-Length`` bytes of block + CRLF CRLF. ``response``
  records carry an HTTP/1.1 response (status line + headers + body) as
  the block; the body framing inside WARC is Content-Length only
  (chunked/gzip *transfer* encodings are rewritten away by crawlers
  before archiving — out of scope here, documented).

Scale design (the part that matters at 100 TB): shards are
non-splittable but numerous (~100k x 1 GB), so parallelism is one task
per shard — ``read_warc`` lists paths via the binaryFile source WITHOUT
selecting ``content`` (column pruning keeps the JVM from materializing
shard bytes), repartitions the path list, and the Python kernel STREAMS
each shard with a bounded decompress window: memory is O(largest
record), never O(shard). Record payloads land as one Arrow binary cell
each, so downstream ops batch them like any other blob column.
"""

from __future__ import annotations

import gzip
import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "src_file string, rec_idx long, warc_type string, record_id string, "
    "target_uri string, warc_date string, http_status int, "
    "http_content_type string, payload binary"
)

WARC_TEXT_SCHEMA = (
    "record_id string, target_uri string, http_status int, "
    "title string, text string, n_links int"
)

_MAX_HEADER_BYTES = 64 * 1024
_READ_CHUNK = 1 << 18


# ---------------------------------------------------------------------------
# writer (fixture/export side)


def write_warc_gz(path: str, records: list[dict]) -> None:
    """Write records as a Common Crawl-style .warc.gz: one gzip member
    per record, mtime pinned to 0 so shards are byte-deterministic.

    Each record dict: ``warc_type``, ``record_id``, ``target_uri``
    (optional), ``warc_date``, ``block`` (bytes). Content-Length is
    computed here; callers build HTTP response blocks with
    ``http_response_block``."""
    with open(path, "wb") as f:
        for rec in records:
            block = rec["block"]
            lines = [b"WARC/1.0"]
            lines.append(b"WARC-Type: " + rec["warc_type"].encode())
            lines.append(b"WARC-Record-ID: " + rec["record_id"].encode())
            lines.append(b"WARC-Date: " + rec["warc_date"].encode())
            if rec.get("target_uri"):
                lines.append(b"WARC-Target-URI: " + rec["target_uri"].encode())
            ctype = rec.get(
                "content_type",
                "application/http; msgtype=response"
                if rec["warc_type"] in ("response", "request")
                else "application/warc-fields",
            )
            lines.append(b"Content-Type: " + ctype.encode())
            lines.append(b"Content-Length: " + str(len(block)).encode())
            raw = b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"
            f.write(gzip.compress(raw, mtime=0))


def http_response_block(
    body: bytes, status: int = 200, content_type: str = "text/html; charset=utf-8"
) -> bytes:
    """An HTTP/1.1 response block for a ``response`` record."""
    head = (
        f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


# ---------------------------------------------------------------------------
# streaming reader (pure Python; the Spark kernel wraps it)


class _GzStream:
    """Bounded-memory reader over a multi-member gzip file: feeds
    compressed chunks through zlib, restarting the decompressor at member
    boundaries (``unused_data``), and exposes exact-n reads and CRLF line
    reads over the decompressed byte stream."""

    def __init__(self, fileobj) -> None:
        self._f = fileobj
        self._z = zlib.decompressobj(wbits=31)
        self._buf = bytearray()
        self._eof = False

    def _fill(self) -> bool:
        while not self._eof:
            if self._z.eof:
                tail = self._z.unused_data
                self._z = zlib.decompressobj(wbits=31)
                if tail:
                    self._buf += self._z.decompress(tail)
                    continue
            chunk = self._f.read(_READ_CHUNK)
            if not chunk:
                if not self._z.eof and self._z.unconsumed_tail:
                    raise ValueError("truncated gzip member")
                self._eof = True
                return False
            self._buf += self._z.decompress(chunk)
            if self._buf:
                return True
        return False

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            had = len(self._buf)
            self._fill()
            if len(self._buf) == had and self._eof:
                raise ValueError(f"EOF inside a record: wanted {n}, had {had}")
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def read_line(self) -> bytes | None:
        """One CRLF/LF-terminated line without the terminator; None at a
        clean EOF before any byte."""
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line = bytes(self._buf[:i])
                del self._buf[: i + 1]
                return line.rstrip(b"\r")
            if len(self._buf) > _MAX_HEADER_BYTES:
                raise ValueError("unterminated header line")
            had = len(self._buf)
            self._fill()
            if len(self._buf) == had and self._eof:
                if not self._buf:
                    return None
                line = bytes(self._buf)
                self._buf.clear()
                return line.rstrip(b"\r")


def _parse_headers(stream: _GzStream) -> dict[str, str] | None:
    """WARC header block -> lowercase-keyed dict; None at clean EOF.
    Tolerates blank padding lines between records."""
    line = stream.read_line()
    while line is not None and line == b"":
        line = stream.read_line()
    if line is None:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"expected a WARC version line, got {line[:40]!r}")
    headers: dict[str, str] = {}
    last = ""
    while True:
        line = stream.read_line()
        if line is None:
            raise ValueError("EOF inside WARC headers")
        if line == b"":
            return headers
        if line[:1] in (b" ", b"\t") and last:
            # RFC-style folded continuation of the previous header
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        k, _, v = line.partition(b":")
        last = k.strip().decode("ascii", "replace").lower()
        headers[last] = v.strip().decode("utf-8", "replace")


def _parse_http_response(block: bytes) -> tuple[int, str, bytes]:
    """HTTP response block -> (status, content_type, body). Identity
    framing only (see module docstring)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        raise ValueError("malformed HTTP response block")
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    status = int(parts[1])
    ctype = ""
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
    return status, ctype, body


class _RawStream:
    """The _GzStream read interface over already-decompressed bytes —
    lets the record parser run on a single extracted gzip member."""

    def __init__(self, data: bytes) -> None:
        self._buf = bytearray(data)

    def read_exact(self, n: int) -> bytes:
        if len(self._buf) < n:
            raise ValueError(f"EOF inside a record: wanted {n}, had {len(self._buf)}")
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def read_line(self) -> bytes | None:
        if not self._buf:
            return None
        i = self._buf.find(b"\n")
        if i < 0:
            line = bytes(self._buf)
            self._buf.clear()
        else:
            line = bytes(self._buf[:i])
            del self._buf[: i + 1]
        return line.rstrip(b"\r")


def iter_warc_records(fileobj) -> Iterator[dict]:
    """Stream records out of an open .warc.gz file object. Yields dicts:
    warc_type / record_id / target_uri / warc_date / http_status /
    http_content_type / payload. For ``response`` records the payload is
    the HTTP BODY; for every other type it is the raw block."""
    yield from _iter_records(_GzStream(fileobj))


def _iter_records(stream) -> Iterator[dict]:
    while True:
        headers = _parse_headers(stream)
        if headers is None:
            return
        n = int(headers.get("content-length", "-1"))
        if n < 0:
            raise ValueError("WARC record without Content-Length")
        block = stream.read_exact(n)
        wtype = headers.get("warc-type", "")
        status, ctype, payload = 0, "", block
        if wtype == "response" and block.startswith(b"HTTP/"):
            status, ctype, payload = _parse_http_response(block)
        yield {
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": status,
            "http_content_type": ctype,
            "payload": payload,
        }


# ---------------------------------------------------------------------------
# Spark operators


def _strip_scheme(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path


def _shard_scan_kernel(record_types: tuple[str, ...] | None):
    """mapInPandas kernel over a (path) column: open each shard, stream
    its gzip members, emit one row per WARC record. Shared by the batch
    and streaming scans; the type filter runs here so skipped records
    never cross the Arrow boundary (request/metadata records are the
    bulk of raw crawl shards)."""
    wanted = tuple(record_types) if record_types else None

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                local = _strip_scheme(str(p))
                rows = []
                with open(local, "rb") as f:
                    for i, rec in enumerate(iter_warc_records(f)):
                        if wanted and rec["warc_type"] not in wanted:
                            continue
                        rows.append(
                            (
                                os.path.basename(local),
                                i,
                                rec["warc_type"],
                                rec["record_id"],
                                rec["target_uri"],
                                rec["warc_date"],
                                rec["http_status"],
                                rec["http_content_type"],
                                rec["payload"],
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "src_file",
                        "rec_idx",
                        "warc_type",
                        "record_id",
                        "target_uri",
                        "warc_date",
                        "http_status",
                        "http_content_type",
                        "payload",
                    ],
                )

    return scan


def read_warc(
    spark: SparkSession, path_glob: str, record_types: tuple[str, ...] | None = None
) -> DataFrame:
    """Distributed WARC scan: one row per record across every shard
    matching ``path_glob``.

    The binaryFile source does the (distributed, catalog-free) listing;
    only ``path`` is selected so its ``content`` column is pruned before
    the scan materializes anything (the count below is likewise a
    listing-metadata job, never a byte read). The path list repartitions
    so each shard is its own task, and the kernel streams members with
    bounded memory."""
    paths = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path")
    )
    n_files = paths.count()
    return paths.repartition(max(n_files, 1)).mapInPandas(
        _shard_scan_kernel(record_types), schema=WARC_SCHEMA
    )


BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc_records(
    spark: SparkSession, path_glob: str, record_types: tuple[str, ...] | None = None
) -> DataFrame:
    """Streaming WARC ingestion: shards LANDING under the glob are
    discovered per microbatch by the checkpointed file source (each shard
    processed exactly once — the crawl-drop pattern: a fetcher fleet
    writes finished .warc.gz shards, this stream curates them as they
    arrive). Same pruned path listing and bounded-memory member streamer
    as the batch scan; no repartition (a streaming plan sizes tasks from
    the microbatch's file split — cap batch width with
    ``maxFilesPerTrigger`` upstream of heavy kernels)."""
    paths = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .load(path_glob)
        .select("path")
    )
    return paths.mapInPandas(_shard_scan_kernel(record_types), schema=WARC_SCHEMA)


def warc_html_text(records: DataFrame) -> DataFrame:
    """HTML body -> (title, text, n_links) over ``response`` records via
    the stdlib extractor (``functions/html.extract_text``): tags
    stripped, entities resolved, script/style subtrees dropped,
    whitespace collapsed. mapInPandas — one Python pass per payload, no
    shuffle; non-HTML responses are filtered JVM-side first."""
    from conflation_spark.functions.html import extract_text

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, uri, status, payload in zip(
                pdf["record_id"], pdf["target_uri"], pdf["http_status"], pdf["payload"]
            ):
                text, title, n_links = extract_text(
                    bytes(payload).decode("utf-8", "replace")
                )
                rows.append((rid, uri, int(status), title, text, n_links))
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id",
                    "target_uri",
                    "http_status",
                    "title",
                    "text",
                    "n_links",
                ],
            )

    html = records.where(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").startswith("text/html")
    ).select("record_id", "target_uri", "http_status", "payload")
    return html.mapInPandas(op, schema=WARC_TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# CDX-style random access (member offsets)


def iter_warc_members(fileobj) -> Iterator[tuple[int, int, bytes]]:
    """Walk the gzip MEMBERS of a .warc.gz: yields (compressed_offset,
    compressed_length, decompressed_bytes) per member. This is the
    byte-offset layer CDX indexes are built on — with the Common Crawl
    member-per-record convention, (offset, length) addresses one record
    for later random access without rescanning the shard."""
    offset = 0
    carry = b""  # compressed bytes read past the previous member's end
    z = zlib.decompressobj(wbits=31)
    out = bytearray()
    consumed_into_member = 0
    while True:
        chunk = carry if carry else fileobj.read(_READ_CHUNK)
        carry = b""
        if not chunk:
            if out or consumed_into_member:
                raise ValueError("truncated gzip member")
            return
        out += z.decompress(chunk)
        if z.eof:
            tail = z.unused_data
            member_len = consumed_into_member + (len(chunk) - len(tail))
            yield offset, member_len, bytes(out)
            offset += member_len
            consumed_into_member = 0
            out = bytearray()
            z = zlib.decompressobj(wbits=31)
            carry = tail
        else:
            consumed_into_member += len(chunk)


def fetch_warc_record(path: str, offset: int, length: int) -> dict:
    """Random access: read ONE record by its CDX (offset, length) without
    touching the rest of the shard. Requires the member-per-record layout
    (the CC convention — ``warc_cdx`` only indexes such members)."""
    with open(path, "rb") as f:
        f.seek(offset)
        comp = f.read(length)
    raw = zlib.decompress(comp, wbits=31)
    recs = list(_iter_records(_RawStream(raw)))
    if len(recs) != 1:
        raise ValueError(f"member at {offset} holds {len(recs)} records, not 1")
    return recs[0]


CDX_SCHEMA = (
    "src_file string, offset long, clen long, rec_in_member int, "
    "warc_type string, record_id string, target_uri string"
)


def warc_cdx(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed CDX-style index build: one row per WARC record with
    the (offset, clen) of its gzip member — the artifact that makes a
    shard randomly addressable (``fetch_warc_record``) without a rescan.
    Same pruned path listing / task-per-shard plan as ``read_warc``;
    payload bytes never cross the Arrow boundary, only header fields.
    ``rec_in_member`` is 0 under the CC member-per-record convention;
    whole-file-member shards index with increasing values (random access
    then needs the full member — fetch_warc_record refuses those)."""
    paths = spark.read.format("binaryFile").load(path_glob).select("path")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                local = _strip_scheme(str(p))
                rows = []
                with open(local, "rb") as f:
                    for off, clen, raw in iter_warc_members(f):
                        for j, rec in enumerate(_iter_records(_RawStream(raw))):
                            rows.append(
                                (
                                    os.path.basename(local),
                                    off,
                                    clen,
                                    j,
                                    rec["warc_type"],
                                    rec["record_id"],
                                    rec["target_uri"],
                                )
                            )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "src_file", "offset", "clen", "rec_in_member",
                        "warc_type", "record_id", "target_uri",
                    ],
                )

    n_files = paths.count()
    return paths.repartition(max(n_files, 1)).mapInPandas(kern, schema=CDX_SCHEMA)
