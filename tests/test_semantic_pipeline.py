"""End-to-end SEMANTIC curation over raw text — the composed pipeline
this session's additions enable with no external model:

  documents -> in-engine embeddings (embed.py)
            -> PCA dimension reduction (pca.py)
            -> ANN retrieval in the reduced space (similarity.py)
            -> embedding near-dup pairs -> clusters (dedup/cluster)
            -> leakage-safe split (corpus.py)

Assertions use the corpus's PLANTED structure (exact-dup lineage and
topic vocabularies), never a re-implementation of the operators: planted
duplicates must embed identically, cluster together, survive dedup as
one representative, and never straddle a train/eval split; topic-mates
must out-rank cross-topic docs in ANN retrieval."""

import numpy as np
from pyspark.sql import functions as F

from conflation_spark.operators.cluster import connected_components
from conflation_spark.operators.corpus import cluster_safe_split
from conflation_spark.operators.dedup import embedding_cosine_pairs
from conflation_spark.operators.embed import EMBED_DIM, embed_documents
from conflation_spark.operators.pca import pca_fit, pca_project
from conflation_spark.operators.similarity import brute_force_topk

N_TOPICS = 4
PER_TOPIC = 25
N_DUPS = 10


def _corpus(spark):
    """Topic-structured docs + planted exact duplicates."""
    rng = np.random.default_rng(11)
    vocab = {t: [f"t{t}w{i}" for i in range(120)] for t in range(N_TOPICS)}
    shared = [f"sw{i}" for i in range(40)]
    rows = []
    for t in range(N_TOPICS):
        for i in range(PER_TOPIC):
            words = list(rng.choice(vocab[t], 30)) + list(rng.choice(shared, 10))
            rng.shuffle(words)
            rows.append((f"t{t}d{i:02d}", t, " ".join(words)))
    originals = [rows[i * PER_TOPIC] for i in range(N_TOPICS)] + [
        rows[i] for i in range(N_DUPS - N_TOPICS)
    ]
    dups = [(f"dup{j:02d}_{r[0]}", r[1], r[2]) for j, r in enumerate(originals)]
    df = spark.createDataFrame(rows + dups, "doc_id string, topic int, text string")
    return df, {d[0]: d[0].split("_", 1)[1] for d in dups}


def test_semantic_pipeline_end_to_end(spark):
    docs, dup_of = _corpus(spark)
    emb = embed_documents(docs, "doc_id", "text").cache()
    n_docs = docs.count()
    assert emb.count() == n_docs  # every doc has tokens

    # planted exact dups embed bit-identically
    vecs = {r["doc_id"]: tuple(r["embedding"]) for r in emb.collect()}
    for dup, orig in dup_of.items():
        assert vecs[dup] == vecs[orig], dup

    # PCA 64 -> 12 keeps the topic structure: ANN in the REDUCED space
    # ranks same-topic docs above cross-topic ones, and a dup's nearest
    # non-self neighbor is its original at cosine 1.0
    model = pca_fit(emb, "embedding", EMBED_DIM, k=12)
    assert model.explained_variance[0] > 0
    red = pca_project(emb, model, "doc_id", "embedding", out_col="vec").cache()
    corpus = red.selectExpr("doc_id as vec_id", "vec")
    probes = red.where(F.col("doc_id").startswith("dup")).selectExpr(
        "doc_id as query_id", "vec"
    )
    top = brute_force_topk(corpus, probes, k=3, id_col="vec_id", vec_col="vec")
    best = {
        r["query_id"]: r["neighbor_id"] for r in top.collect() if r["rank"] == 1
    }
    for dup, orig in dup_of.items():
        got = best[dup]
        # rank 1 is the original OR its own co-duplicate (also cosine 1.0)
        assert got == orig or dup_of.get(got) == orig, (dup, got)

    # rank-1 must always stay in-topic; deeper ranks may occasionally
    # cross (hashed 64-dim embeddings + 25% shared vocabulary), but the
    # retrieved set must be overwhelmingly in-topic
    topic_of = {r["doc_id"]: r["topic"] for r in docs.collect()}
    top_rows = top.collect()
    for r in top_rows:
        if r["rank"] == 1:
            assert topic_of[r["query_id"]] == topic_of[r["neighbor_id"]], r
    in_topic = sum(
        1 for r in top_rows if topic_of[r["query_id"]] == topic_of[r["neighbor_id"]]
    )
    assert in_topic / len(top_rows) > 0.85, in_topic / len(top_rows)

    # near-dup pairs -> clusters: every planted dup joins its original
    pairs = embedding_cosine_pairs(emb, "doc_id", "embedding", 0.999)
    cc = connected_components(pairs, id_a="id_a", id_b="id_b")
    label = {r["id"]: r["cluster_id"] for r in cc.collect()}
    for dup, orig in dup_of.items():
        assert label[dup] == label[orig], dup

    # leakage-safe split: no dup lands opposite its original
    labels = cc.select(F.col("id").alias("doc_id"), "cluster_id")
    split = cluster_safe_split(docs, labels, weights={"train": 0.8, "eval": 0.2})
    side = {r["doc_id"]: r["split"] for r in split.collect()}
    assert len(side) == n_docs
    for dup, orig in dup_of.items():
        assert side[dup] == side[orig], dup
    assert {"train", "eval"} >= set(side.values())
    emb.unpersist()
    red.unpersist()
