"""End-to-end web-corpus build over the WARC fixture — the composed
pipeline a crawl-curation user runs: ingest shards -> extract text ->
quality gate -> near-dup dedup -> leakage-safe split -> domain cap.

Assertions use the fixture's PLANTED structure (dup_of lineage, per-host
truth counts), never a re-implementation of the operators: every planted
near-dup pair must land in one dedup cluster, dedup keeps exactly one doc
per cluster, no held-out doc shares a cluster with train, and no host
exceeds its cap."""

import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from conflation_spark.datagen_warc import gen_warc_fixture
from conflation_spark.operators.cluster import connected_components
from conflation_spark.operators.corpus import (
    cluster_safe_split,
    per_source_cap,
    url_features,
)
from conflation_spark.operators.dedup import minhash_lsh_pairs
from conflation_spark.operators.text import with_token_counts
from conflation_spark.sources.warc import read_warc, warc_html_text


def test_web_corpus_build_end_to_end(spark, tmp_path):
    gen_warc_fixture(str(tmp_path), 240)
    truth = pq.read_table(str(tmp_path / "warc_truth.parquet")).to_pydict()
    words_of = dict(zip(truth["record_id"], truth["n_words"]))
    # assert recall only on pairs with enough shingle mass on both sides:
    # a 3-word body has one 3-gram, where a single perturbed word drops
    # Jaccard to ~0 — not a near-dup by any definition the LSH should find
    planted = {
        (min(a, b), max(a, b))
        for a, b in zip(truth["dup_of"], truth["record_id"])
        if a and words_of[a] >= 20 and words_of[b] >= 20
    }
    assert len(planted) >= 10, "fixture should plant near-dup pages"

    # 1) ingest + extract
    pages = warc_html_text(
        read_warc(spark, str(tmp_path / "*.warc.gz"), record_types=("response",))
    )
    # 2) quality gate: drop short pages (all fixture pages pass — the gate
    #    is exercised, not load-bearing, so dup lineage stays intact)
    kept = with_token_counts(pages, text_col="text").where(F.col("n_tokens") >= 5)
    assert kept.count() == sum(1 for n in truth["n_words"] if n >= 5)

    # 3) near-dup candidates + clusters
    pairs = minhash_lsh_pairs(kept, id_col="record_id", text_col="text")
    found = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in pairs.collect()
    }
    missed = planted - found
    assert not missed, f"planted near-dups missed by LSH: {sorted(missed)[:3]}"

    labels = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "id", "record_id"
    )
    lab = {r["record_id"]: r["cluster_id"] for r in labels.collect()}
    for a, b in planted:
        assert lab[a] == lab[b], (a, b)
    # singletons (no pair) are their own cluster downstream via coalesce

    # 4) leakage-safe split: cluster members never straddle splits
    split = cluster_safe_split(kept, labels, id_col="record_id")
    sp = {r["record_id"]: (r["cluster_id"], r["split"]) for r in split.collect()}
    by_cluster = {}
    for rid, (cl, s) in sp.items():
        by_cluster.setdefault(cl, set()).add(s)
    assert all(len(s) == 1 for s in by_cluster.values()), "split leaked a cluster"
    for a, b in planted:
        assert sp[a][1] == sp[b][1]

    # 5) dedup: keep the canonical (minimum-id) doc per cluster
    deduped = (
        split.withColumn(
            "is_canon",
            F.col("record_id")
            == F.min("record_id").over(Window.partitionBy("cluster_id")),
        )
        .where("is_canon")
        .drop("is_canon")
    )
    n_dedup = deduped.count()
    n_clusters = len({cl for cl, _ in sp.values()})
    assert n_dedup == n_clusters

    # 6) domain cap over url host
    hosts = url_features(
        deduped.select(F.col("target_uri").alias("url"))
    ).select("url", "host")
    deduped = deduped.withColumnRenamed("target_uri", "url")
    capped = per_source_cap(
        deduped.join(hosts, "url"), cap=8, id_col="record_id", source_col="host"
    )
    per_host = {
        r["host"]: r["n"]
        for r in capped.groupBy("host").count().withColumnRenamed("count", "n").collect()
    }
    assert per_host and max(per_host.values()) <= 8
    # the cap actually bit: at least one host was at/above the cap pre-cap
    pre = {
        r["host"]: r["n"]
        for r in deduped.join(hosts, "url")
        .groupBy("host").count().withColumnRenamed("count", "n").collect()
    }
    assert max(pre.values()) > 8
