"""ANN similarity search + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conflation_spark.datagen_text import ensure_text_fixture
from conflation_spark.operators import multimodal, similarity


@pytest.fixture(scope="module")
def vectors(spark):
    d = ensure_text_fixture("sf0.001")
    return spark.read.parquet(f"{d}/vectors.parquet").cache()


def _brute_topk_local(rows, k=5):
    v = {r["vec_id"]: np.array(r["vec"]) for r in rows}
    nrm = {i: np.linalg.norm(x) for i, x in v.items()}
    out = {}
    for q in list(sorted(v))[:20]:
        sims = []
        for n in v:
            if n == q:
                continue
            c = float(v[q] @ v[n] / (nrm[q] * nrm[n]))
            sims.append((round(c * 1_000_000), n))
        sims.sort(key=lambda x: (-x[0], x[1]))
        out[q] = [(n, r + 1, c) for r, (c, n) in enumerate(sims[:k])]
    return out


def test_brute_force_topk_matches_numpy(spark, vectors):
    rows = vectors.collect()
    queries = vectors.orderBy("vec_id").limit(20).selectExpr("vec_id as query_id", "vec")
    got = {}
    res = similarity.brute_force_topk(vectors, queries, k=5, id_col="vec_id", vec_col="vec")
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["rank"], r["cosine_c"]))
    want = _brute_topk_local(rows, k=5)
    for q, lst in want.items():
        got_l = sorted(got[q], key=lambda x: x[1])
        assert [(n, r) for n, r, _ in got_l] == [(n, r) for n, r, _ in lst], q
        for (gn, gr, gc), (wn, wr, wc) in zip(got_l, lst):
            assert abs(gc - wc) <= 1  # 1e-6 rounding ulp tolerance


def test_lsh_topk_finds_true_neighbors(spark, vectors):
    """LSH ANN's contract: vectors that are GENUINELY similar (the planted
    near-dups, cosine ~1) collide in some table and are found at rank 1.
    Full recall@k vs brute force is measured and reported by bench.py at
    sf0.1 (multi-table family: 0.96+ on the clustered corpus); this test
    pins the hard floor — near-dup retrieval — at tiny fixture scale."""
    kinds = {r["vec_id"]: r["kind"] for r in vectors.collect()}
    near_dups = [v for v, k in sorted(kinds.items()) if k == "near_dup"][:20]
    queries = vectors.where(F.col("vec_id").isin(near_dups)).selectExpr(
        "vec_id as query_id", "vec"
    )
    bf = similarity.brute_force_topk(vectors, queries, k=5, id_col="vec_id", vec_col="vec")
    ann = similarity.lsh_topk(vectors, queries, k=5, id_col="vec_id", vec_col="vec")
    bf_top1 = {}
    for r in bf.collect():
        if r["rank"] == 1:
            bf_top1[r["query_id"]] = r["neighbor_id"]
    ann_top1 = {}
    ann_sets = {}
    for r in ann.collect():
        ann_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if r["rank"] == 1:
            ann_top1[r["query_id"]] = r["neighbor_id"]
    # every near-dup query finds its twin at rank 1, same as brute force
    assert near_dups and all(ann_top1.get(q) == bf_top1[q] for q in near_dups)


def test_multimodal_plumbing(spark, fixture_dir):
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    blobs = multimodal.synth_blobs(spark, docs).cache()
    assert blobs.count() > 0
    meta = multimodal.media_metadata(blobs)
    m = meta.collect()
    assert all(r["n_bytes"] == 32 for r in m)  # sha256-derived fake payloads
    assert len({r["media_kind"] for r in m}) == 3

    frames = multimodal.sample_frames(blobs, every_n=2, n_frames=3)
    n_videos = blobs.where(F.col("media_kind") == "video").count()
    assert frames.count() == 3 * n_videos
    idxs = {r["frame_idx"] for r in frames.collect()}
    assert idxs == {0, 2, 4}


def test_image_features_real_decode_matches_planted_truth(spark):
    """The REAL decode path end-to-end: the fixture's media_blobs carry
    genuine PNG bytes (all five scanline filters) plus truth columns
    computed from the source pixels; extract_image_features must reproduce
    width/height and the quantized 4x4 grid feature exactly, for EVERY
    blob."""
    d = ensure_text_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/media_blobs.parquet")
    feats = multimodal.extract_image_features(blobs)
    q = [
        F.floor(F.col("feature")[i] * 1e6 + F.lit(0.5)).cast("long").alias(f"g{i}")
        for i in range(16)
    ]
    got = feats.select("media_ref", "width", "height", *q)
    joined = got.join(blobs, "media_ref")
    n = blobs.count()
    assert joined.count() == n
    ok = joined.where(
        (F.col("width") == F.col("true_width"))
        & (F.col("height") == F.col("true_height"))
        & F.expr(" AND ".join(f"g{i} = f{i}" for i in range(16)))
    )
    assert ok.count() == n


def test_jpeg_features_real_decode_within_tolerance_of_truth(spark):
    """The COMPRESSED decode path end-to-end: the fixture's jpeg_blobs
    carry genuine baseline JPEG bytes plus truth columns from the source
    pixels; extract_image_features with the JPEG decoder must reproduce
    width/height EXACTLY and the grid feature within JPEG_FEAT_TOL
    (JPEG is lossy), for EVERY blob."""
    d = ensure_text_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/jpeg_blobs.parquet")
    feats = multimodal.extract_image_features(
        blobs, decoder=multimodal.decode_jpeg_image
    )
    joined = feats.join(blobs, "media_ref")
    n = blobs.count()
    assert joined.count() == n
    diffs = [
        F.abs(F.col("feature")[i] - F.col(f"f{i}") / F.lit(1e6)) for i in range(16)
    ]
    ok = joined.where(
        (F.col("width") == F.col("true_width"))
        & (F.col("height") == F.col("true_height"))
        & (F.greatest(*diffs) <= F.lit(multimodal.JPEG_FEAT_TOL))
    )
    assert ok.count() == n


def test_multimodal_decode_raises_on_garbage():
    with pytest.raises(ValueError):
        multimodal.decode_image(b"not a png at all")
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_image(b"not a jpeg either")


def test_multimodal_decoder_injectable(spark):
    """The decoder kwarg still allows swapping kernels (e.g. a JPEG decoder
    on a cluster that has one) without touching the Spark plumbing."""
    blobs = spark.createDataFrame(
        [("x", b"\x01\x02", "image")],
        "media_ref string, content binary, media_kind string",
    )
    fake = lambda content: (2, 3, np.full(16, 0.5))  # noqa: E731
    rows = multimodal.extract_image_features(blobs, decoder=fake).collect()
    assert rows[0]["width"] == 2 and rows[0]["height"] == 3
    assert rows[0]["feature"] == [0.5] * 16


def test_ivf_topk_finds_true_neighbors(spark, vectors):
    """IVF ANN: planted near-dups (cosine ~1) land in the same inverted
    list and are found at rank 1, matching brute force."""
    kinds = {r["vec_id"]: r["kind"] for r in vectors.collect()}
    near_dups = [v for v, k in sorted(kinds.items()) if k == "near_dup"][:20]
    queries = vectors.where(F.col("vec_id").isin(near_dups)).selectExpr(
        "vec_id as query_id", "vec"
    )
    bf = similarity.brute_force_topk(vectors, queries, k=5, id_col="vec_id", vec_col="vec")
    ivf = similarity.ivf_topk(vectors, queries, k=5, id_col="vec_id", vec_col="vec")
    bf_top1 = {r["query_id"]: r["neighbor_id"] for r in bf.collect() if r["rank"] == 1}
    ivf_top1 = {r["query_id"]: r["neighbor_id"] for r in ivf.collect() if r["rank"] == 1}
    assert near_dups and all(ivf_top1.get(q) == bf_top1[q] for q in near_dups)


def test_brute_force_query_bound_enforced(spark, vectors):
    """An oversized probe set must fail fast (the collect contract is
    enforced, not assumed) — and the cap is adjustable."""
    import pytest

    queries = vectors.limit(8).selectExpr("vec_id as query_id", "vec")
    with pytest.raises(ValueError, match="query probe set exceeds"):
        similarity.brute_force_topk(
            vectors, queries, k=3, id_col="vec_id", vec_col="vec", max_queries=5
        )
    # at/below the cap it runs
    ok = similarity.brute_force_topk(
        vectors, queries.limit(5), k=3, id_col="vec_id", vec_col="vec", max_queries=5
    )
    assert ok.count() == 15


def test_audio_features_real_decode_matches_planted_truth(spark):
    """The REAL audio path end-to-end: fixture WAV blobs decode in the
    kernel and reproduce sample_rate / n_samples / n_channels / the
    quantized 16-segment feature exactly, for EVERY blob."""
    d = ensure_text_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/audio_blobs.parquet")
    feats = multimodal.extract_audio_features(blobs)
    q = [
        F.floor(F.col("feature")[i] * 1e6 + F.lit(0.5)).cast("long").alias(f"g{i}")
        for i in range(16)
    ]
    got = feats.select("media_ref", "sample_rate", "n_samples", "n_channels", *q)
    joined = got.join(blobs, "media_ref")
    n = blobs.count()
    assert joined.count() == n
    ok = joined.where(
        (F.col("sample_rate") == F.col("true_sample_rate"))
        & (F.col("n_samples") == F.col("true_n_samples"))
        & (F.col("n_channels") == F.col("true_n_channels"))
        & F.expr(" AND ".join(f"g{i} = a{i}" for i in range(16)))
    )
    assert ok.count() == n


def test_audio_decode_raises_on_garbage():
    with pytest.raises(ValueError):
        multimodal.decode_audio(b"definitely not audio")


def test_video_frames_real_decode_matches_planted_truth(spark):
    """The REAL video path: fixture Y4M blobs parsed in the kernel; the
    sampled frames' dims and quantized luma means equal the truth planted
    from the source planes, for EVERY blob."""
    d = ensure_text_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/video_blobs.parquet")
    got = multimodal.extract_video_frames(blobs, every_n=2, max_frames=3)
    joined = got.join(blobs, "media_ref")
    n = blobs.count()
    assert joined.count() == 3 * n  # every blob has >= 5 frames
    m = (
        F.when(F.col("frame_idx") == 0, F.col("m0"))
        .when(F.col("frame_idx") == 2, F.col("m1"))
        .otherwise(F.col("m2"))
    )
    ok = joined.where(
        (F.col("width") == F.col("true_width"))
        & (F.col("height") == F.col("true_height"))
        & (F.col("y_mean_c") == m)
    )
    assert ok.count() == 3 * n


def test_video_decode_raises_on_garbage():
    with pytest.raises(ValueError):
        multimodal.decode_video_frames(b"not a y4m stream")


def test_h264_frames_real_decode_matches_planted_truth(spark):
    """The COMPRESSED video path: fixture Annex-B H.264 streams decoded
    in the kernel (CAVLC + intra reconstruction); sampled-frame dims and
    quantized Y/U/V means equal the truth planted from the encoder's
    reconstruction loop — bit-exact with a correct decode — for EVERY
    blob."""
    from conflation_spark.datagen_text import ensure_h264_fixture

    d = ensure_h264_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/h264_blobs.parquet")
    got = multimodal.extract_compressed_video_frames(blobs, every_n=2, max_frames=3)
    joined = got.join(blobs, "media_ref")
    n = blobs.count()
    assert joined.count() == 3 * n  # every blob has >= 5 frames
    def pick(a, b, c):
        return (
            F.when(F.col("frame_idx") == 0, F.col(a))
            .when(F.col("frame_idx") == 2, F.col(b))
            .otherwise(F.col(c))
        )
    ok = joined.where(
        (F.col("width") == F.col("true_width"))
        & (F.col("height") == F.col("true_height"))
        & (F.col("y_mean_c") == pick("m0", "m1", "m2"))
        & (F.col("u_mean_c") == pick("u0", "u1", "u2"))
        & (F.col("v_mean_c") == pick("v0", "v1", "v2"))
    )
    assert ok.count() == 3 * n


def test_h264_decode_raises_on_garbage():
    with pytest.raises(ValueError):
        multimodal.decode_h264_frame_stats(b"not an avc stream")


def _pq_local(rows, query_ids, m_sub, n_cents, k):
    """Exact Python ADC oracle: shared-kernel codebooks, argmin encoding,
    integerized LUT gather-sum — mirrors pq_topk's documented math."""
    import math

    from conflation_spark.functions.kernels import kmeans_lloyd

    ids = sorted(r["vec_id"] for r in rows)
    v = {r["vec_id"]: np.array(r["vec"], dtype=np.float64) for r in rows}
    x = np.array([v[i] for i in ids[:2048]])
    dsub = x.shape[1] // m_sub
    books = [kmeans_lloyd(x[:, m * dsub:(m + 1) * dsub], n_cents) for m in range(m_sub)]
    codes = {}
    for i in ids:
        codes[i] = [
            int(np.argmin(((v[i][m * dsub:(m + 1) * dsub] - books[m]) ** 2).sum(-1)))
            for m in range(m_sub)
        ]
    out = {}
    for q in query_ids:
        lut = [
            [
                math.floor(((v[q][m * dsub:(m + 1) * dsub] - books[m][c]) ** 2).sum() * 1e4 + 0.5)
                for c in range(n_cents)
            ]
            for m in range(m_sub)
        ]
        scored = sorted(
            (sum(lut[m][codes[n][m]] for m in range(m_sub)), n)
            for n in ids
            if n != q
        )
        out[q] = [(n, r + 1, d) for r, (d, n) in enumerate(scored[:k])]
    return out


def test_pq_topk_matches_python_adc_oracle(spark, vectors):
    rows = vectors.collect()
    query_ids = sorted(r["vec_id"] for r in rows)[:10]
    queries = vectors.where(F.col("vec_id").isin(query_ids)).selectExpr(
        "vec_id as query_id", "vec"
    )
    got = {}
    res = similarity.pq_topk(
        vectors, queries, k=5, m_sub=8, n_cents=16, id_col="vec_id", vec_col="vec"
    )
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["rank"], r["adc_c"]))
    want = _pq_local(rows, query_ids, m_sub=8, n_cents=16, k=5)
    for q in query_ids:
        assert sorted(got[q], key=lambda x: x[1]) == want[q], q


def test_pq_rerank_finds_true_neighbors(spark, vectors):
    """ADC alone cannot rank within a quantization cell (cluster members
    share codes -> adc ties); the exact re-rank stage resolves it: every
    planted near-dup query finds its twin at rank 1, matching brute
    force. Also pins the ADC shortlist's recall: the twin must SURVIVE
    the compressed-domain pass to be re-rankable at all."""
    kinds = {r["vec_id"]: r["kind"] for r in vectors.collect()}
    near_dups = [v for v, k in sorted(kinds.items()) if k == "near_dup"][:20]
    queries = vectors.where(F.col("vec_id").isin(near_dups)).selectExpr(
        "vec_id as query_id", "vec"
    )
    bf = similarity.brute_force_topk(vectors, queries, k=1, id_col="vec_id", vec_col="vec")
    pq = similarity.pq_topk(
        vectors, queries, k=1, id_col="vec_id", vec_col="vec", rerank=32
    )
    bf_top1 = {r["query_id"]: r["neighbor_id"] for r in bf.collect() if r["rank"] == 1}
    pq_top1 = {r["query_id"]: r["neighbor_id"] for r in pq.collect() if r["rank"] == 1}
    assert near_dups and all(pq_top1.get(q) == bf_top1[q] for q in near_dups)


def test_pq_encode_compression_shape(spark, vectors):
    """The stored index carries m_sub small codes per vector — the scan
    -size story — and every code addresses a real codebook row."""
    books = similarity.train_pq_codebooks(
        vectors, m_sub=8, n_cents=16, id_col="vec_id", vec_col="vec"
    )
    assert books.shape == (8, 16, 8)
    enc = similarity.pq_encode(vectors, books, id_col="vec_id", vec_col="vec")
    rows = enc.collect()
    assert len(rows) == vectors.count()
    assert all(len(r["codes"]) == 8 and all(0 <= c < 16 for c in r["codes"]) for r in rows)


def test_pq_dim_not_divisible_raises(spark):
    bad = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0])], "vec_id string, vec array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        similarity.train_pq_codebooks(bad, m_sub=2, n_cents=2, id_col="vec_id", vec_col="vec")


def test_ivf_pq_topk_matches_python_oracle(spark, vectors):
    """Exact replay: IVF probe selection + global-codebook integer ADC
    within the probed lists only."""
    from conflation_spark.functions.kernels import kmeans_lloyd

    m_sub, n_cents, n_lists, n_probe, k = 8, 16, 8, 3, 5
    rows = vectors.collect()
    ids = sorted(r["vec_id"] for r in rows)
    v = {r["vec_id"]: np.array(r["vec"], dtype=np.float64) for r in rows}
    x = np.array([v[i] for i in ids[:2048]])
    cents = kmeans_lloyd(x, n_lists)
    dsub = x.shape[1] // m_sub
    books = [kmeans_lloyd(x[:, m * dsub:(m + 1) * dsub], n_cents) for m in range(m_sub)]

    def list_of(vec):
        return int(np.argmin(((vec - cents) ** 2).sum(-1)))

    def codes_of(vec):
        return [
            int(np.argmin(((vec[m * dsub:(m + 1) * dsub] - books[m]) ** 2).sum(-1)))
            for m in range(m_sub)
        ]

    query_ids = ids[:8]
    queries = vectors.where(F.col("vec_id").isin(query_ids)).selectExpr(
        "vec_id as query_id", "vec"
    )
    got = {}
    res = similarity.ivf_pq_topk(
        vectors, queries, k=k, n_lists=n_lists, n_probe=n_probe,
        m_sub=m_sub, n_cents=n_cents, id_col="vec_id", vec_col="vec",
        centroids=cents, codebooks=np.stack(books),
    )
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["rank"], r["adc_c"]))
    import math
    for q in query_ids:
        qv = v[q]
        probed = set(np.argsort(((qv - cents) ** 2).sum(-1), kind="stable")[:n_probe].tolist())
        lut = [
            [math.floor(((qv[m * dsub:(m + 1) * dsub] - books[m][c]) ** 2).sum() * 1e4 + 0.5)
             for c in range(n_cents)]
            for m in range(m_sub)
        ]
        scored = sorted(
            (sum(lut[m][codes_of(v[n])[m]] for m in range(m_sub)), n)
            for n in ids
            if n != q and list_of(v[n]) in probed
        )
        want = [(n, r + 1, d) for r, (d, n) in enumerate(scored[:k])]
        assert sorted(got[q], key=lambda t: t[1]) == want, q


def test_ivf_pq_rerank_finds_true_neighbors(spark, vectors):
    kinds = {r["vec_id"]: r["kind"] for r in vectors.collect()}
    near_dups = [vv for vv, kk in sorted(kinds.items()) if kk == "near_dup"][:20]
    queries = vectors.where(F.col("vec_id").isin(near_dups)).selectExpr(
        "vec_id as query_id", "vec"
    )
    bf = similarity.brute_force_topk(vectors, queries, k=1, id_col="vec_id", vec_col="vec")
    ann = similarity.ivf_pq_topk(
        vectors, queries, k=1, id_col="vec_id", vec_col="vec", rerank=32
    )
    bf1 = {r["query_id"]: r["neighbor_id"] for r in bf.collect() if r["rank"] == 1}
    an1 = {r["query_id"]: r["neighbor_id"] for r in ann.collect() if r["rank"] == 1}
    assert near_dups and all(an1.get(q) == bf1[q] for q in near_dups)


def test_ivf_pq_candidate_join_broadcasts_probes(spark, vectors):
    queries = vectors.orderBy("vec_id").limit(5).selectExpr("vec_id as query_id", "vec")
    plan = (
        similarity.ivf_pq_topk(vectors, queries, k=3, id_col="vec_id", vec_col="vec")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # probes side broadcast; corpus unshuffled


def test_empty_probe_set_returns_empty(spark, vectors):
    """An empty query DataFrame must yield an empty result from every
    collect-side ANN operator, not an IndexError on a shape-(0,) matrix
    (r5 review finding: the len(qids)-aware dim guard skipped validation
    but the LUT build still sliced the 1-D empty array)."""
    empty_q = vectors.limit(0).selectExpr("vec_id as query_id", "vec")
    bf = similarity.brute_force_topk(vectors, empty_q, k=3, id_col="vec_id", vec_col="vec")
    assert bf.count() == 0
    assert [f.name for f in bf.schema] == ["query_id", "neighbor_id", "rank", "cosine_c"]
    pq = similarity.pq_topk(vectors, empty_q, k=3, id_col="vec_id", vec_col="vec")
    assert pq.count() == 0
    ivfpq = similarity.ivf_pq_topk(
        vectors, empty_q, k=3, id_col="vec_id", vec_col="vec", rerank=10
    )
    assert ivfpq.count() == 0


def test_image_resize_matches_planted_truth(spark):
    """decode->resize chain over real GIF blobs: resized-raster md5 and
    dims equal truth planted from the SOURCE pixels for EVERY blob (GIF
    lossless + bit-deterministic integer resize)."""
    from conflation_spark.datagen_text import ensure_gif_fixture
    from conflation_spark.functions.gif import decode_gif

    d = ensure_gif_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/gif_blobs.parquet")
    got = multimodal.resize_images(blobs, decoder=decode_gif)
    joined = got.join(blobs, "media_ref")
    n = blobs.count()
    ok = joined.where(
        (F.col("src_width") == F.col("true_width"))
        & (F.col("src_height") == F.col("true_height"))
        & (F.col("width") == F.col("rs_w"))
        & (F.col("height") == F.col("rs_h"))
        & (F.col("px_md5") == F.col("rs_md5"))
    )
    assert ok.count() == n == got.count()
