"""In-engine text embedder: pure-Python oracle parity (exact, not
tolerance — raw coordinates are integer sums), unit norm, partition
invariance, semantic behavior (duplicate texts collide, near-dups stay
close), and composition with PCA + ANN."""

import hashlib

import numpy as np

from conflation_spark.operators.embed import (
    EMBED_BUCKETS,
    EMBED_DIM,
    EMBED_SEED,
    embed_documents,
    embedding_entries,
    projection_matrix,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "the quick brown fox jumps over the lazy dog"),  # exact dup
    ("d3", "the quick brown fox leaps over the lazy dog"),  # near dup
    ("d4", "completely different subject matter entirely here today"),
    ("d5", "   "),  # whitespace only -> dropped
    ("d6", "singleton"),
]


def _py_embed(text: str) -> np.ndarray | None:
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return None
    counts: dict[int, int] = {}
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:13], 16) % EMBED_BUCKETS
        counts[b] = counts.get(b, 0) + 1
    raw = np.zeros(EMBED_DIM, dtype=np.int64)
    for b, c in counts.items():
        for d in range(EMBED_DIM):
            h = int(hashlib.md5(f"{EMBED_SEED}:{b}_{d}".encode()).hexdigest()[:13], 16)
            raw[d] += c * (1 if h % 2 == 0 else -1)
    ss = int(raw @ raw)
    if ss == 0:
        return None
    return raw / np.sqrt(float(ss))


def _embed_all(spark, parts=3):
    df = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(parts)
    out = embed_documents(df, "doc_id", "text").collect()
    return {r["doc_id"]: np.array(r["embedding"]) for r in out}


def test_matches_python_oracle_exactly(spark):
    got = _embed_all(spark)
    assert set(got) == {"d1", "d2", "d3", "d4", "d6"}  # d5 dropped
    for did, text in DOCS:
        want = _py_embed(text)
        if want is None:
            assert did not in got
        else:
            # bit-identical: integer raw sums + IEEE sqrt/divide
            assert got[did].tolist() == want.tolist(), did


def test_unit_norm_and_determinism(spark):
    got = _embed_all(spark)
    for v in got.values():
        assert abs(float(v @ v) - 1.0) < 1e-12
    again = _embed_all(spark, parts=7)
    for did in got:
        assert got[did].tolist() == again[did].tolist()


def test_entries_partition_invariant(spark):
    df3 = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(3)
    df1 = spark.createDataFrame(DOCS, "doc_id string, text string").coalesce(1)
    a = sorted(
        map(tuple, embedding_entries(embed_documents(df3, "doc_id", "text"), "doc_id").collect())
    )
    b = sorted(
        map(tuple, embedding_entries(embed_documents(df1, "doc_id", "text"), "doc_id").collect())
    )
    assert a == b


def test_semantic_geometry(spark):
    got = _embed_all(spark)
    assert got["d1"].tolist() == got["d2"].tolist()  # dup -> identical
    near = float(got["d1"] @ got["d3"])
    far = float(got["d1"] @ got["d4"])
    assert near > 0.8
    assert near > far + 0.2


def test_projection_matrix_properties():
    m = projection_matrix()
    assert m.shape == (EMBED_BUCKETS, EMBED_DIM)
    assert set(np.unique(m)) == {-1, 1}
    # roughly balanced signs (md5 is uniform): within 2% of half
    frac = (m == 1).mean()
    assert 0.48 < frac < 0.52
    # cached: same object back
    assert projection_matrix() is m


def test_composes_with_pca_and_ann(spark):
    from conflation_spark.operators.pca import pca_fit, pca_project
    from conflation_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(300)]
    rows = [
        (f"doc{i:03d}", " ".join(rng.choice(words, size=40)))
        for i in range(80)
    ]
    rows.append(("dup_of_doc000", rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    emb = embed_documents(df, "doc_id", "text")

    model = pca_fit(emb, "embedding", EMBED_DIM, k=16)
    proj = pca_project(emb, model, "doc_id", "embedding", out_col="vec")
    assert proj.count() == 81

    q = emb.where("doc_id = 'dup_of_doc000'").selectExpr(
        "doc_id as query_id", "embedding as vec"
    )
    corpus = emb.selectExpr("doc_id as vec_id", "embedding as vec")
    top = brute_force_topk(corpus, q, k=2, id_col="vec_id", vec_col="vec").collect()
    ranked = sorted(top, key=lambda r: r["rank"])
    # self-matches are excluded, so the exact duplicate's nearest
    # neighbor is the original, at cosine exactly 1.0
    assert ranked[0]["neighbor_id"] == "doc000"
    assert ranked[0]["cosine_c"] == 1_000_000


def test_stateless_equals_aggregate_path(spark):
    """Per-row kernel == aggregate path, bit-for-bit (same integer raw
    sums, same IEEE normalization, same tokenizer semantics)."""
    from conflation_spark.operators.embed import embed_documents_stateless

    df = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(3)
    agg = {r["doc_id"]: r["embedding"] for r in embed_documents(df, "doc_id", "text").collect()}
    row = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents_stateless(df, "doc_id", "text").collect()
    }
    assert set(agg) == set(row)
    for k in agg:
        assert agg[k] == row[k], k


def test_streaming_embeddings_equal_batch(spark, tmp_path):
    """The readStream embedder over the textdocs fixture produces
    exactly the batch embed_documents rows (ingest-time embedding)."""
    import time

    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.streaming.ingest import streaming_doc_embeddings

    d = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{d}/textdocs.parquet")
    src = str(tmp_path / "textdocs_stream")
    td.select("text_id", "text").repartition(3).write.parquet(src)

    out = streaming_doc_embeddings(spark, src)
    q = (
        out.writeStream.format("memory")
        .queryName("sembed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 120
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive, "stream did not finish"
    got = {
        r["text_id"]: r["embedding"]
        for r in spark.sql("select * from sembed").collect()
    }
    want = {
        r["text_id"]: r["embedding"]
        for r in embed_documents(td, "text_id", "text").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k
