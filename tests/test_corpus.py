"""Corpus-composition operators (per_source_cap / source_stats /
cluster_safe_split) vs exact pure-Python oracles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conflation_spark.operators.corpus import (
    cluster_safe_split,
    per_source_cap,
    source_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def _h52(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:13], 16)


def _cap_oracle(rows, cap):
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    out = {}
    for src, ids in by_src.items():
        ranked = sorted(ids, key=lambda i: (_h52(i), i))[:cap]
        out.update({(src, i): rank + 1 for rank, i in enumerate(ranked)})
    return out


def test_per_source_cap_matches_python_oracle(spark, docs):
    cap = 7
    rows = docs.select("doc_id", "source").collect()
    got = {
        (r["source"], r["doc_id"]): r["cap_rank"]
        for r in per_source_cap(docs, cap).select("source", "doc_id", "cap_rank").collect()
    }
    assert got == _cap_oracle(rows, cap)
    # the cap binds: every source has more docs than cap in this fixture
    n_src = docs.select("source").distinct().count()
    assert len(got) == cap * n_src


def test_per_source_cap_keeps_all_under_cap(spark, docs):
    n = docs.count()
    assert per_source_cap(docs, cap=10**9).count() == n


def test_per_source_cap_salt_invariant(spark, docs):
    """The two-phase salted ranking is EXACT: any salt fan-out yields the
    identical kept set (phase 1 never discards a global per-source
    winner)."""
    a = {
        (r["source"], r["doc_id"], r["cap_rank"])
        for r in per_source_cap(docs, 5, salt_parts=1).select("source", "doc_id", "cap_rank").collect()
    }
    b = {
        (r["source"], r["doc_id"], r["cap_rank"])
        for r in per_source_cap(docs, 5, salt_parts=32).select("source", "doc_id", "cap_rank").collect()
    }
    assert a == b


def test_per_source_cap_windows_are_salted(spark, docs):
    """Skew contract: the first (big-data) window partitions on (source,
    salt) — no task sorts a whole hot domain; only the bounded phase-2
    window partitions on source alone."""
    plan = per_source_cap(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(source" in plan and "_salt" in plan
    # a window partitioned on (source, _salt) exists (phase 1)
    assert any(
        "_salt" in seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    )
    # and Spark 4's WindowGroupLimit prunes map-side BEFORE each exchange
    # (top-cap per group per input partition), composing with the salt:
    # the final per-source task sorts <= cap * salt_parts rows
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_source_stats_matches_python_oracle(spark, docs):
    rows = docs.collect()
    want = {}
    for r in rows:
        s = want.setdefault(r["source"], [0, 0, set()])
        s[0] += 1
        s[1] += len(r["text"])
        s[2].add(r["lang"])
    got = {
        r["source"]: (r["n_docs"], r["total_chars"], r["mean_chars_c"], r["n_langs"])
        for r in source_stats(docs).collect()
    }
    assert got == {
        src: (n, t, t * 100 // n, len(langs)) for src, (n, t, langs) in want.items()
    }


def test_cluster_safe_split_keeps_clusters_together(spark, docs):
    """Members of a cluster always share a split; singletons (docs absent
    from the label table) are their own cluster."""
    labels = spark.createDataFrame(
        [(i, "c0") for i in range(0, 40)] + [(i, "c1") for i in range(40, 60)],
        "doc_id long, cluster_id string",
    )
    out = cluster_safe_split(docs, labels).select("doc_id", "cluster_id", "split").collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in docs.select("doc_id").collect()}
    singles = [r for r in out if r["doc_id"] >= 60]
    assert all(r["cluster_id"] == str(r["doc_id"]) for r in singles)


def test_cluster_safe_split_matches_python_oracle(spark, docs):
    labels = spark.createDataFrame(
        [(i, "c0") for i in range(0, 40)], "doc_id long, cluster_id string"
    )
    weights = {"test": 0.1, "train": 0.8, "val": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in cluster_safe_split(docs, labels, weights).collect()
    }

    def split_of(cluster):
        h = hashlib.md5(str(cluster).encode()).hexdigest()[:8]
        if h < format(int(0.1 * 16**8), "08x"):
            return "test"
        if h < format(int(0.9 * 16**8), "08x"):
            return "train"
        return "val"

    for r in docs.select("doc_id").collect():
        i = r["doc_id"]
        assert got[i] == split_of("c0" if i < 40 else str(i)), i
    # all three splits are live on this corpus
    assert set(got.values()) == {"train", "val", "test"}


def test_cluster_safe_split_bad_weights_raise(spark, docs):
    labels = spark.createDataFrame([], "doc_id long, cluster_id string")
    with pytest.raises(ValueError, match="sum to 1"):
        cluster_safe_split(docs, labels, {"train": 0.5, "val": 0.1})


def test_per_source_cap_bad_cap_raises(spark, docs):
    with pytest.raises(ValueError, match="cap must be"):
        per_source_cap(docs, 0)


def test_url_features_edge_cases(spark):
    from conflation_spark.operators.corpus import url_features

    cases = [
        # (url, host, tld, depth, n_params, https)
        ("https://www.example.com/a/b/c?x=1&y=2", "www.example.com", "com", 3, 2, 1),
        ("http://EXAMPLE.org", "example.org", "org", 0, 0, 0),
        ("http://example.org/", "example.org", "org", 0, 0, 0),
        ("https://host.io:8080/p", "host.io", "io", 1, 0, 1),
        ("http://no-tld/path/", "no-tld", "", 1, 0, 0),
        ("https://a.co.uk/x?only", "a.co.uk", "uk", 1, 1, 1),
        ("https://q.net/a//b/?k=#frag", "q.net", "uk" if False else "net", 3, 1, 1),
        ("https://www.example.com/other", "www.example.com", "com", 1, 0, 1),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = {r["url"].lower(): r for r in url_features(df).collect()}
    host_counts = {}
    for u, h, *_ in cases:
        host_counts[h] = host_counts.get(h, 0) + 1
    for u, h, tld, depth, npar, https in cases:
        r = got[u.lower()]
        assert r["host"] == h, u
        assert r["tld"] == tld, u
        assert r["path_depth"] == depth, u
        assert r["n_params"] == npar, u
        assert r["is_https"] == https, u
        assert r["host_docs"] == host_counts[h], u
