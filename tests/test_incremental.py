"""Incremental dedup: the corpus band checkpoint is read bucketed with no
re-hashing and no corpus-side shuffle (plan-asserted), and the incremental
end state EQUALS the from-scratch run."""

import pytest
from pyspark.sql import functions as F

from conflation_spark.datagen_text import ensure_text_fixture
from conflation_spark.operators.cluster import dedup_clusters
from conflation_spark.operators.dedup import minhash_lsh_pairs
from conflation_spark.operators.incremental import (
    checkpoint_band_table,
    corpus_self_pairs,
    incremental_dedup,
    incremental_minhash_pairs,
)

TBL = "test_corpus_bands"


@pytest.fixture(scope="module")
def split_corpus(spark):
    # deliberately UNcached: the plan tests assert on the parquet scans,
    # and a cached InMemoryRelation (here or from another module sharing
    # the session) would swallow them
    d = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{d}/textdocs.parquet")
    corpus = td.where(F.col("text_id") < "t000200")
    delta = td.where(F.col("text_id") >= "t000200")
    assert corpus.count() > 0 and delta.count() > 0
    return corpus, delta, td


def _ancestors_shuffle_free(plan: str, scan_marker: str) -> None:
    """Assert no shuffle (Exchange hashpartitioning) sits between the
    marked scan line and its nearest enclosing join — i.e. the branch
    reaches the join with its scan partitioning intact. BroadcastExchange
    is allowed (Catalyst may legitimately broadcast the small side at
    test scale; it is not a shuffle of the corpus)."""
    import re

    lines = plan.splitlines()
    scan_idx = [i for i, ln in enumerate(lines) if scan_marker in ln]
    assert scan_idx, plan
    for i in scan_idx:
        depth = len(re.match(r"[\s:+\-*]*", lines[i]).group(0))
        j = i - 1
        while j >= 0:
            d2 = len(re.match(r"[\s:+\-*]*", lines[j]).group(0))
            if d2 < depth:
                assert "Exchange hashpartitioning" not in lines[j], (lines[j], plan)
                if "Join" in lines[j]:
                    break  # reached the join: this branch was shuffle-free
                depth = d2
            j -= 1


def test_checkpoint_is_bucketed_and_join_shuffles_delta_only(spark, split_corpus):
    corpus, delta, _ = split_corpus
    # other modules sharing the session may have cached the textdocs scan;
    # an InMemoryRelation would hide the pushed filters this test reads
    spark.catalog.clearCache()
    checkpoint_band_table(corpus, TBL, "text_id", "text")
    # force SMJ so the test exercises the partitioning contract that
    # matters at real scale (tiny inputs would otherwise broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = incremental_minhash_pairs(spark, TBL, delta, "text_id", "text")
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the corpus side is the bucketed file scan — no text read, no hashing
    assert "Bucketed: true" in plan, plan
    assert TBL in plan
    # corpus text is NEVER rescanned: every textdocs scan carries the
    # delta's pushed filter (the corpus rows come only from the checkpoint)
    for ln in plan.splitlines():
        if "textdocs" in ln and "FileScan" in ln:
            assert "GreaterThanOrEqual(text_id,t000200)" in ln, ln
    # and the bucketed scan reaches its join without being re-shuffled
    _ancestors_shuffle_free(plan, "Bucketed: true")


def test_corpus_self_pairs_no_exchange(spark, split_corpus):
    """Both sides of the corpus self-join are the bucketed scan: the join
    is co-partitioned on band_hash — zero shuffles below the join; the
    only hash exchange in the whole plan is the final distinct's."""
    corpus, _, _ = split_corpus
    checkpoint_band_table(corpus, TBL, "text_id", "text")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = corpus_self_pairs(spark, TBL)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, "text_id", "text").collect()
    }
    assert got == want
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan  # distinct only
    _ancestors_shuffle_free(plan, "Bucketed: true")


def test_incremental_end_state_equals_from_scratch(spark, split_corpus):
    """The whole point: checkpoint corpus bands, label the corpus, then
    fold in the delta — the final (cluster_id, keep) assignment must equal
    dedup_clusters run from scratch on the full corpus, exactly."""
    corpus, delta, full = split_corpus
    checkpoint_band_table(corpus, TBL, "text_id", "text")
    corpus_labels = dedup_clusters(
        corpus, corpus_self_pairs(spark, TBL), id_col="text_id"
    ).select(F.col("text_id").alias("id"), "cluster_id")

    inc = incremental_dedup(spark, TBL, corpus_labels, delta, "text_id", "text")
    scratch = dedup_clusters(
        full, minhash_lsh_pairs(full, "text_id", "text"), id_col="text_id"
    )
    got = {(r["text_id"], r["cluster_id"], r["keep"]) for r in inc.collect()}
    want = {(r["text_id"], r["cluster_id"], r["keep"]) for r in scratch.collect()}
    assert got == want
    assert len(got) == full.count()


def test_incremental_components_merges_across_bridge(spark):
    """Component-level merge semantics: a delta node paired with members
    of TWO prior clusters merges them to one min-labeled component (the
    case a naive 'assign delta to nearest cluster' gets wrong)."""
    from conflation_spark.operators.incremental import incremental_components

    prior = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1"), ("z9", "z9")],
        "id string, cluster_id string",
    )
    new_pairs = spark.createDataFrame(
        [("a2", "d1"), ("b2", "d1")], "id_a string, id_b string"
    )
    got = {r["id"]: r["cluster_id"] for r in incremental_components(new_pairs, prior).collect()}
    # a* and b* merge through d1 to min label a1; untouched z9 not emitted
    assert got == {"a1": "a1", "a2": "a1", "b1": "a1", "b2": "a1", "d1": "a1"}


def test_incremental_merges_clusters_across_the_delta_bridge(spark):
    """End-to-end: a delta doc that LSH-pairs with docs in TWO distinct
    corpus clusters must merge them. The texts are chosen so the fixed
    hash family deterministically collides (c1,d1) and (c2,d1) in at
    least one band while (c1,c2) share no shingles at all."""
    base_a = " ".join(f"q{i}l" for i in range(30))
    base_b = " ".join(f"q{i}r" for i in range(30))
    corpus = spark.createDataFrame(
        [("c1", base_a), ("c2", base_b)], "text_id string, text string"
    )
    bridge = base_a + " " + base_b
    delta = spark.createDataFrame([("d1", bridge)], "text_id string, text string")
    checkpoint_band_table(corpus, TBL + "_bridge", "text_id", "text")
    labels0 = dedup_clusters(
        corpus, corpus_self_pairs(spark, TBL + "_bridge"), id_col="text_id"
    ).select(F.col("text_id").alias("id"), "cluster_id")
    # sanity: corpus clusters start distinct
    assert {r["cluster_id"] for r in labels0.collect()} == {"c1", "c2"}
    inc = incremental_dedup(
        spark, TBL + "_bridge", labels0, delta, "text_id", "text"
    )
    got = {r["text_id"]: r["cluster_id"] for r in inc.collect()}
    assert got == {"c1": "c1", "c2": "c1", "d1": "c1"}


def test_hot_bucket_caps_bound_the_incremental_join(spark):
    """Boilerplate guard: a hot band bucket (many docs sharing identical
    boilerplate) is dropped on BOTH sides — at checkpoint time for the
    corpus, at join time for the delta — so the candidate join stays
    bounded; distinct content still pairs normally."""
    boiler = " ".join(f"b{i}" for i in range(30))
    corpus_rows = [(f"c{i:03d}", boiler) for i in range(20)]
    corpus_rows.append(("cxx", " ".join(f"u{i}x" for i in range(30))))
    delta_rows = [(f"d{i:03d}", boiler) for i in range(20)]
    delta_rows.append(("dxx", " ".join(f"u{i}x" for i in range(30))))
    corpus = spark.createDataFrame(corpus_rows, "text_id string, text string")
    delta = spark.createDataFrame(delta_rows, "text_id string, text string")

    # uncapped: the boilerplate cluster cross-joins (20x20 + pairs)
    checkpoint_band_table(corpus, TBL + "_hot", "text_id", "text")
    uncapped = incremental_minhash_pairs(spark, TBL + "_hot", delta, "text_id", "text")
    assert uncapped.count() > 400

    # capped at 5: boilerplate buckets (size 20) drop on both sides;
    # only the distinct-content pair (cxx, dxx) survives
    checkpoint_band_table(
        corpus, TBL + "_hotc", "text_id", "text", max_bucket_size=5
    )
    capped = incremental_minhash_pairs(
        spark, TBL + "_hotc", delta, "text_id", "text", max_bucket_size=5
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {("cxx", "dxx")}


def test_incremental_embedding_pairs_equal_batch(spark):
    """Embedding twin of the incremental band join: corpus signatures come
    from the bucketed checkpoint (no re-signing), and the incremental
    pairs for a delta equal the NEW pairs of the batch run over
    corpus+delta (pairs involving at least one delta vector)."""
    from conflation_spark.operators.dedup import embedding_cosine_pairs
    from conflation_spark.operators.incremental import (
        checkpoint_emb_band_table,
        incremental_embedding_pairs,
    )

    d = ensure_text_fixture("sf0.001")
    v = spark.read.parquet(f"{d}/vectors.parquet").select("vec_id", "vec")
    corpus = v.where(F.col("vec_id") < "v000200")
    delta = v.where(F.col("vec_id") >= "v000200")
    checkpoint_emb_band_table(corpus, "test_emb_bands", "vec_id", "vec")
    got = {
        (r["id_a"], r["id_b"], r["cosine_c"])
        for r in incremental_embedding_pairs(
            spark, "test_emb_bands", corpus, delta, "vec_id", "vec", 0.95
        ).collect()
    }
    batch = {
        (r["id_a"], r["id_b"], r["cosine_c"])
        for r in embedding_cosine_pairs(v, "vec_id", "vec", 0.95).collect()
    }
    want = {t for t in batch if t[0] >= "v000200" or t[1] >= "v000200"}
    assert got == want and got
    # plan: the corpus band scan is the bucketed checkpoint
    plan = (
        incremental_embedding_pairs(
            spark, "test_emb_bands", corpus, delta, "vec_id", "vec", 0.95
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Bucketed: true" in plan


def test_incremental_ivf_index_assign_drift_and_search(spark):
    """The IVF incremental story end-to-end:
    1. delta assignment against checkpointed centroids is bit-equal to a
       full rebuild's assignment of those rows;
    2. search over the folded index equals the batch ivf_topk at the same
       centroids, and READS ONLY PROBED BUCKETS (bucket pruning asserted);
    3. an in-distribution delta does not trigger a re-train, a shifted
       one does."""
    import numpy as np

    from conflation_spark.operators.incremental import (
        checkpoint_ivf_index,
        incremental_ivf_assign,
        incremental_ivf_topk,
        ivf_drift_check,
        load_ivf_centroids,
    )
    from conflation_spark.operators.similarity import ivf_topk, train_ivf_centroids

    d = ensure_text_fixture("sf0.001")
    v = spark.read.parquet(f"{d}/vectors.parquet").select("vec_id", "vec")
    corpus = v.where(F.col("vec_id") < "v000200")
    delta = v.where(F.col("vec_id") >= "v000200")
    cents = train_ivf_centroids(corpus, n_lists=16, id_col="vec_id", vec_col="vec")
    checkpoint_ivf_index(corpus, "test_ivf_idx", cents, "vec_id", "vec")
    # round-trip centroids are the exact floats
    assert np.array_equal(load_ivf_centroids(spark, "test_ivf_idx"), cents)

    # 1. delta assignment == full rebuild at the same centroids
    got_d = incremental_ivf_assign(
        spark, "test_ivf_idx", delta, "vec_id", "vec", append=False
    )
    from conflation_spark.operators.similarity import ivf_assign_udf

    want = delta.select(
        F.col("vec_id").alias("id"), ivf_assign_udf(cents)(F.col("vec")).alias("list_id")
    )
    got_map = {r["id"]: r["list_id"] for r in got_d.collect()}
    want_map = {r["id"]: r["list_id"] for r in want.collect()}
    assert got_map == want_map and got_map

    # 2. fold the delta in; search == batch ivf_topk at the same centroids
    incremental_ivf_assign(spark, "test_ivf_idx", delta, "vec_id", "vec", append=True)
    assert spark.table("test_ivf_idx").count() == v.count()
    q = v.orderBy("vec_id").limit(10).selectExpr("vec_id as query_id", "vec")
    inc = incremental_ivf_topk(spark, "test_ivf_idx", q, k=5, n_probe=4)
    batch = ivf_topk(
        v, q, k=5, n_probe=4, id_col="vec_id", vec_col="vec", centroids=cents
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, inc.collect()), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, batch.collect()), key=lambda t: (t[0], t[2])
    )
    # bucket pruning: the index scan reads a strict subset of buckets
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) < int(m.group(2)), m.group(0)

    # 3. drift: in-distribution delta is quiet, a shifted delta triggers
    quiet = ivf_drift_check(spark, "test_ivf_idx", delta, "vec_id", "vec")
    assert not quiet["retrain"], quiet
    shifted = delta.select(
        "vec_id", F.transform("vec", lambda x: x * 5.0 + 7.0).alias("vec")
    )
    loud = ivf_drift_check(spark, "test_ivf_idx", shifted, "vec_id", "vec")
    assert loud["retrain"] and loud["delta_p95"] > loud["corpus_p95"], loud


def test_incremental_ivf_custom_buckets_and_empty_corpus(spark):
    """Appends must honor the TABLE's bucket spec (not a constant), and
    an empty corpus checkpoints cleanly with a 0.0 drift baseline so
    the first real delta reads as drift."""
    import numpy as np

    from conflation_spark.operators.incremental import (
        checkpoint_ivf_index,
        incremental_ivf_assign,
        ivf_drift_check,
    )

    cents = np.eye(4, 64, dtype=np.float64)
    d = ensure_text_fixture("sf0.001")
    v = spark.read.parquet(f"{d}/vectors.parquet").select("vec_id", "vec")
    corpus = v.where(F.col("vec_id") < "v000100")
    delta = v.where((F.col("vec_id") >= "v000100") & (F.col("vec_id") < "v000150"))
    # non-default bucket count survives the append
    checkpoint_ivf_index(corpus, "test_ivf_b8", cents, "vec_id", "vec", n_buckets=8)
    incremental_ivf_assign(spark, "test_ivf_b8", delta, "vec_id", "vec", append=True)
    assert spark.table("test_ivf_b8").count() == corpus.count() + delta.count()
    # empty corpus: checkpoint succeeds, stats row is 0.0, delta drifts
    empty = spark.createDataFrame([], "vec_id string, vec array<double>")
    checkpoint_ivf_index(empty, "test_ivf_empty", cents, "vec_id", "vec")
    base = {
        r["metric"]: r["value"]
        for r in spark.table("test_ivf_empty_stats").collect()
    }
    assert base["d2_p95"] == 0.0
    assert ivf_drift_check(spark, "test_ivf_empty", delta, "vec_id", "vec")["retrain"]


def test_incremental_embedding_redelivered_id_prefers_delta_vector(spark):
    """A re-delivered id carrying an UPDATED vector must be verified
    against the DELTA's vector deterministically (anti-join dedup), not
    whichever duplicate a partition saw first."""
    import math

    from conflation_spark.operators.incremental import (
        checkpoint_emb_band_table,
        incremental_embedding_pairs,
    )

    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    corpus = spark.createDataFrame(
        [("A", e1), ("X", e2)], "vec_id string, vec array<double>"
    )
    # X re-delivered with A's direction: the pair (A, X) is only >= 0.95
    # under the NEW vector
    delta = spark.createDataFrame([("X", e1)], "vec_id string, vec array<double>")
    checkpoint_emb_band_table(corpus, "test_emb_upd", "vec_id", "vec")
    got = {
        (r["id_a"], r["id_b"]): r["cosine_c"]
        for r in incremental_embedding_pairs(
            spark, "test_emb_upd", corpus, delta, "vec_id", "vec", 0.95
        ).collect()
    }
    assert got.get(("A", "X")) == 10_000, got  # cosine 1.0 at the 1e4 scale


def test_band_checkpoint_append_honors_table_bucket_spec(spark):
    """checkpoint_band_table(mode='append') must reuse the EXISTING
    table's bucket count, not the call's n_buckets default — otherwise
    growing a non-default-bucketed corpus checkpoint raises Spark's
    bucketing-mismatch error."""
    d = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{d}/textdocs.parquet")
    a = td.where(F.col("text_id") < "t000050")
    b = td.where((F.col("text_id") >= "t000050") & (F.col("text_id") < "t000080"))
    checkpoint_band_table(a, "test_bands_b8", "text_id", "text", n_buckets=8)
    # default n_buckets (16) on the append call: must follow the table's 8
    checkpoint_band_table(b, "test_bands_b8", "text_id", "text", mode="append")
    got = spark.table("test_bands_b8").select("id").distinct().count()
    assert got == a.count() + b.count()


def test_incremental_embedding_dedups_within_delta(spark):
    """Ids duplicated WITHIN one delta batch (at-least-once re-delivery
    concatenated together) must not multiply verified rows."""
    from conflation_spark.operators.incremental import (
        checkpoint_emb_band_table,
        incremental_embedding_pairs,
    )

    e1 = [1.0] + [0.0] * 63
    corpus = spark.createDataFrame([("A", e1)], "vec_id string, vec array<double>")
    delta = spark.createDataFrame(
        [("X", e1), ("X", e1)], "vec_id string, vec array<double>"
    )
    checkpoint_emb_band_table(corpus, "test_emb_dupd", "vec_id", "vec")
    rows = incremental_embedding_pairs(
        spark, "test_emb_dupd", corpus, delta, "vec_id", "vec", 0.95
    ).collect()
    assert [(r["id_a"], r["id_b"], r["cosine_c"]) for r in rows] == [("A", "X", 10_000)]
