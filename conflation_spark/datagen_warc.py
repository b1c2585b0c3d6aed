"""Deterministic WARC fixture: Common Crawl-style .warc.gz shards plus a
planted-truth parquet.

Every HTML page is generated as SOURCE WORDS first; the HTML rendering
then wraps those words in tags, entity-encodes them, inserts
script/style/comment decoys and irregular whitespace. Truth columns
(title, md5 of the collapsed body text, link count) are computed from
the source words BEFORE rendering, so the ``warc_text`` oracle gates the
full inversion chain — gzip member split, WARC framing, HTTP parse,
tag/entity/whitespace handling — not the extractor against itself.

Shards interleave warcinfo/request/metadata records with the responses
(the reader must classify and skip), ~12% of responses are non-HTML or
non-200 (the text query must exclude them), and one page per shard is
rendered with UNCLOSED tags (html.parser recovers; the planted truth
covers the recovery semantics).
"""

from __future__ import annotations

import hashlib
import html as html_mod
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from conflation_spark.datagen_text import VOCAB
from conflation_spark.sources.warc import http_response_block, write_warc_gz

SF_WARC = {"sf0.001": 48, "sf0.01": 240, "sf0.1": 1000, "sf1": 4000}
_PER_SHARD = 80

_SPECIAL = ["x&y", "<tag>", 'a"b', "p'q", "&amp;literal"]


def _words(rng, lo: int, hi: int) -> list[str]:
    n = int(rng.integers(lo, hi))
    out = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(n)]
    if rng.random() < 0.3:
        out[int(rng.integers(0, len(out)))] = _SPECIAL[int(rng.integers(0, len(_SPECIAL)))]
    return out


def _enc_word(rng, w: str) -> str:
    """HTML-render one source word: escaped, sometimes with numeric
    character references (decimal or hex) replacing random chars."""
    if rng.random() < 0.25:
        return "".join(
            (f"&#{ord(c)};" if rng.random() < 0.5 else f"&#x{ord(c):x};")
            if rng.random() < 0.4
            else html_mod.escape(c)
            for c in w
        )
    return html_mod.escape(w)


def _ws(rng) -> str:
    return ["", " ", "  ", "\n", "\n  ", "\t"][int(rng.integers(0, 6))]


def _render_page(rng, title_words, segs, hrefs, broken: bool):
    """(title_words, [(kind, words)], hrefs) -> html string. ``broken``
    leaves some tags unclosed."""
    parts = ["<!DOCTYPE html>", "<html>", "<head>"]
    parts.append(f"<title>{' '.join(_enc_word(rng, w) for w in title_words)}</title>")
    parts.append('<meta charset="utf-8"><meta name="x" content="decoy words here">')
    parts.append(f"<style>p {{ color: #{int(rng.integers(0, 0xFFFFFF)):06x} }}</style>")
    parts.append("</head>", )
    parts.append("<body>")
    link_i = 0
    for kind, words in segs:
        rendered = _ws(rng).join(
            " " + _enc_word(rng, w) + " " for w in words
        )
        if kind == "script":
            parts.append(f"<script>var q = \"{' '.join(words)}\";</script>")
        elif kind == "comment":
            parts.append(f"<!-- {' '.join(words)} -->")
        elif kind == "noscript":
            parts.append(f"<noscript>{rendered}</noscript>")
        elif kind == "link":
            parts.append(f'<a href="{hrefs[link_i]}">{rendered}</a>')
            link_i += 1
        elif kind == "h":
            tag = f"h{int(rng.integers(1, 4))}"
            close = "" if broken and rng.random() < 0.5 else f"</{tag}>"
            parts.append(f"<{tag}>{rendered}{close}")
        elif kind == "bold":
            inner = " ".join(f"<b>{_enc_word(rng, w)}</b>" for w in words)
            parts.append(f"<p>{inner}</p>")
        else:
            close = "" if broken and rng.random() < 0.3 else "</p>"
            parts.append(f"<p>{rendered}{close}")
        parts.append(_ws(rng))
    parts.append("</body></html>")
    return "\n".join(parts)


def gen_warc_fixture(out_dir: str, n_pages: int, seed: int = 41) -> None:
    rng = np.random.default_rng(seed)
    shard_paths: list[str] = []
    truth = {
        "record_id": [], "url": [], "http_status": [],
        "title": [], "text_md5": [], "n_links": [], "n_words": [],
        "dup_of": [],
    }
    rid = 0
    # (record_id, title_words, segs, hrefs) of past HTML pages — the pool
    # near-dup pages (template reuse, the dominant real-web duplication
    # mode) are drawn from; ~2% of body words perturbed => word-3-gram
    # Jaccard ~0.9, the signal minhash near-dup must recover
    past_pages: list[tuple] = []

    def _rid() -> str:
        nonlocal rid
        rid += 1
        return f"<urn:uuid:{rid:08d}-0000-4000-8000-deadbeef{rid % 10_000:04d}>"

    domains = [
        "synth.example", "data.example.com", "news.test.io", "archive.example.net",
        "blog.example.org", "media.test.dev", "wiki.example.edu", "shop.test.biz",
    ]

    def _url(rng, page: int) -> str:
        scheme = "https" if rng.random() < 0.6 else "http"
        sub = ["", "www.", "cdn.", "m."][int(rng.integers(0, 4))]
        host = sub + domains[int(rng.integers(0, len(domains)))]
        port = ":8080" if rng.random() < 0.05 else ""
        depth = int(rng.integers(0, 4))
        segs = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(depth)]
        path = "/" + "/".join([*segs, f"{page:06d}"])
        nq = int(rng.integers(0, 4)) if rng.random() < 0.3 else 0
        q = "&".join(f"k{j}={int(rng.integers(0, 100))}" for j in range(nq))
        return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "")

    page = 0
    shard_no = 0
    while page < n_pages:
        n_here = min(_PER_SHARD, n_pages - page)
        records = [
            dict(
                warc_type="warcinfo",
                record_id=_rid(),
                warc_date="2026-01-01T00:00:00Z",
                block=f"software: conflation-spark-datagen\r\nshard: {shard_no}\r\n".encode(),
            )
        ]
        for _ in range(n_here):
            url = _url(rng, page)
            date = f"2026-01-{int(rng.integers(1, 29)):02d}T{int(rng.integers(0, 24)):02d}:00:00Z"
            records.append(
                dict(
                    warc_type="request",
                    record_id=_rid(),
                    target_uri=url,
                    warc_date=date,
                    block=f"GET {url} HTTP/1.1\r\n\r\n".encode(),
                )
            )
            r = rng.random()
            resp_id = _rid()
            if r < 0.06:  # non-200
                records.append(
                    dict(
                        warc_type="response", record_id=resp_id, target_uri=url,
                        warc_date=date,
                        block=http_response_block(b"not found", 404, "text/plain"),
                    )
                )
            elif r < 0.12:  # non-HTML 200
                records.append(
                    dict(
                        warc_type="response", record_id=resp_id, target_uri=url,
                        warc_date=date,
                        block=http_response_block(b'{"k": 1}', 200, "application/json"),
                    )
                )
            elif len(past_pages) > 10 and rng.random() < 0.12:
                # near-dup page: reuse an earlier page's content with ~2%
                # of visible words replaced (template-drift duplication)
                src_id, s_title, s_segs, s_hrefs = past_pages[
                    int(rng.integers(0, len(past_pages)))
                ]
                segs, body_words = [], []
                for kind, words in s_segs:
                    w2 = list(words)
                    if kind not in ("script", "comment", "noscript"):
                        for _ in range(max(1, len(w2) // 50)):
                            if rng.random() < 0.5:
                                w2[int(rng.integers(0, len(w2)))] = VOCAB[
                                    int(rng.integers(0, len(VOCAB)))
                                ]
                        body_words.extend(w2)
                    segs.append((kind, w2))
                html = _render_page(rng, s_title, segs, s_hrefs, False)
                records.append(
                    dict(
                        warc_type="response", record_id=resp_id, target_uri=url,
                        warc_date=date,
                        block=http_response_block(html.encode("utf-8")),
                    )
                )
                truth["record_id"].append(resp_id)
                truth["url"].append(url)
                truth["http_status"].append(200)
                truth["title"].append(" ".join(s_title))
                body = " ".join(body_words)
                truth["text_md5"].append(hashlib.md5(body.encode("utf-8")).hexdigest())
                truth["n_links"].append(len(s_hrefs))
                truth["n_words"].append(len(body_words))
                truth["dup_of"].append(src_id)
            else:
                title_words = _words(rng, 2, 6)
                n_seg = int(rng.integers(2, 8))
                segs, hrefs, body_words = [], [], []
                for s in range(n_seg):
                    kr = rng.random()
                    words = _words(rng, 3, 20)
                    if kr < 0.12:
                        segs.append(("script", words))  # decoy: NOT in truth
                    elif kr < 0.18:
                        segs.append(("comment", words))  # decoy
                    elif kr < 0.24:
                        segs.append(("noscript", words))  # decoy
                    elif kr < 0.42:
                        segs.append(("link", words))
                        hrefs.append(f"/l/{int(rng.integers(0, 10**6))}")
                        body_words.extend(words)
                    elif kr < 0.55:
                        segs.append(("h", words))
                        body_words.extend(words)
                    elif kr < 0.65:
                        segs.append(("bold", words))
                        body_words.extend(words)
                    else:
                        segs.append(("p", words))
                        body_words.extend(words)
                broken = page % _PER_SHARD == 7
                html = _render_page(rng, title_words, segs, hrefs, broken)
                records.append(
                    dict(
                        warc_type="response", record_id=resp_id, target_uri=url,
                        warc_date=date,
                        block=http_response_block(html.encode("utf-8")),
                    )
                )
                truth["record_id"].append(resp_id)
                truth["url"].append(url)
                truth["http_status"].append(200)
                truth["title"].append(" ".join(title_words))
                body = " ".join(body_words)
                truth["text_md5"].append(hashlib.md5(body.encode("utf-8")).hexdigest())
                truth["n_links"].append(len(hrefs))
                truth["n_words"].append(len(body_words))
                truth["dup_of"].append("")
                past_pages.append((resp_id, title_words, segs, hrefs))
            if rng.random() < 0.1:
                records.append(
                    dict(
                        warc_type="metadata", record_id=_rid(), target_uri=url,
                        warc_date=date,
                        block=b"fetchTimeMs: 12\r\n",
                    )
                )
            page += 1
        path = os.path.join(out_dir, f"shard-{shard_no:05d}.warc.gz")
        write_warc_gz(path, records)
        shard_paths.append(path)
        shard_no += 1

    tbl = pa.table(
        {
            "record_id": pa.array(truth["record_id"], pa.string()),
            "url": pa.array(truth["url"], pa.string()),
            "http_status": pa.array(truth["http_status"], pa.int32()),
            "title": pa.array(truth["title"], pa.string()),
            "text_md5": pa.array(truth["text_md5"], pa.string()),
            "n_links": pa.array(truth["n_links"], pa.int32()),
            "n_words": pa.array(truth["n_words"], pa.int64()),
            "dup_of": pa.array(truth["dup_of"], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "warc_truth.parquet"), row_group_size=512)


def ensure_warc_fixture(sf_name: str, root: str | None = None) -> str:
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "warc"
    )
    if sf_name not in SF_WARC:
        sf_name = "sf0.01"
    out = os.path.join(root, sf_name)
    marker = os.path.join(out, "_SUCCESS_v3")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    # a version bump can change the shard count: drop any stale outputs
    # (and the old marker) so a glob over the dir never sees mixed versions
    for name in os.listdir(out):
        if name.endswith(".warc.gz") or name.endswith(".parquet") or name.startswith("_SUCCESS"):
            os.remove(os.path.join(out, name))
    gen_warc_fixture(out, SF_WARC[sf_name])
    with open(marker, "w") as f:
        f.write("ok")
    return out




SF_ROBOTS = {"sf0.001": 30, "sf0.01": 120, "sf0.1": 400, "sf1": 1200}

_ROBOTS_PATHS = [
    "/", "/private", "/private/data", "/api", "/api/v2", "/img",
    "/cache", "/search", "/users", "/static/js",
]
_ROBOTS_AGENTS = ["graftbot", "otherbot", "megacrawler"]


def gen_robots_fixture(out_dir: str, n_hosts: int, seed: int = 61) -> None:
    """robots.txt fixture with PLANTED rule truth: the generator builds
    the rule STRUCTS first, then renders the robots.txt text around them
    (mixed-case fields, multi-agent groups, comments, blank lines,
    crawl-delay/sitemap noise) — so the ``robots_rules`` oracle gates
    the parser against the source rules, never against itself, and
    ``robots_allowed`` derives decisions from the same planted rows in
    pure SQL. Rendering is lossless for the rule content by
    construction (prefix paths, no wildcards)."""
    rng = np.random.default_rng(seed)
    hosts, texts = [], []
    rule_rows: list[tuple] = []
    url_rows: list[tuple] = []
    for i in range(n_hosts):
        host = f"h{i:04d}.example.com"
        lines: list[str] = []
        order = 0
        if rng.random() < 0.2:
            lines.append("# generated robots fixture")
        for _g in range(int(rng.integers(1, 4))):
            cand = ["*"] + _ROBOTS_AGENTS
            ags = list(
                dict.fromkeys(
                    str(rng.choice(cand)) for _ in range(int(rng.integers(1, 3)))
                )
            )
            for a in ags:
                disp = a if a == "*" else (
                    a.capitalize() if rng.random() < 0.5 else a.upper()
                )
                field = "User-agent" if rng.random() < 0.7 else "USER-AGENT"
                lines.append(f"{field}: {disp}")
            if rng.random() < 0.3:
                lines.append(f"Crawl-delay: {int(rng.integers(1, 10))}")
            for _r in range(int(rng.integers(1, 5))):
                typ = "allow" if rng.random() < 0.35 else "disallow"
                p = str(rng.choice(_ROBOTS_PATHS))
                fld = typ.capitalize() if rng.random() < 0.7 else typ.upper()
                comment = "  # note" if rng.random() < 0.2 else ""
                lines.append(f"{fld}: {p}{comment}")
                for a in ags:
                    rule_rows.append((host, a.lower(), typ, p, order))
                order += 1
            if rng.random() < 0.5:
                lines.append("")
        if rng.random() < 0.3:
            lines.append(f"Sitemap: https://{host}/sitemap.xml")
        hosts.append(host)
        texts.append("\n".join(lines) + "\n")
        for j in range(int(rng.integers(3, 7))):
            base = str(rng.choice(_ROBOTS_PATHS))
            suffix = str(rng.choice(["", "/x", "/page.html", "/1", "/deep/leaf"]))
            path = (base.rstrip("/") + suffix) or "/"
            url_rows.append((f"https://{host}{path}?u={i}-{j}", host, path))
    pq.write_table(
        pa.table({
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(texts, pa.string()),
        }),
        os.path.join(out_dir, "robots_txt.parquet"),
        row_group_size=16,
    )
    pq.write_table(
        pa.table({
            "host": pa.array([r[0] for r in rule_rows], pa.string()),
            "agent": pa.array([r[1] for r in rule_rows], pa.string()),
            "rule_type": pa.array([r[2] for r in rule_rows], pa.string()),
            "path": pa.array([r[3] for r in rule_rows], pa.string()),
            "rule_order": pa.array([r[4] for r in rule_rows], pa.int32()),
        }),
        os.path.join(out_dir, "robots_rules.parquet"),
        row_group_size=256,
    )
    pq.write_table(
        pa.table({
            "url": pa.array([u[0] for u in url_rows], pa.string()),
            "host": pa.array([u[1] for u in url_rows], pa.string()),
            "path": pa.array([u[2] for u in url_rows], pa.string()),
        }),
        os.path.join(out_dir, "robots_urls.parquet"),
        row_group_size=64,
    )


def ensure_robots_fixture(sf_name: str, root: str | None = None) -> str:
    """robots fixture in its own dir with its own marker (same isolation
    rationale as the WARC/GIF fixtures)."""
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "robots",
    )
    if sf_name not in SF_ROBOTS:
        sf_name = "sf0.01"
    out = os.path.join(root, sf_name)
    marker = os.path.join(out, "_SUCCESS_v1")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    gen_robots_fixture(out, SF_ROBOTS[sf_name])
    with open(marker, "w") as f:
        f.write("ok")
    return out


if __name__ == "__main__":
    import sys

    print(ensure_warc_fixture(sys.argv[1] if len(sys.argv) > 1 else "sf0.01"))
