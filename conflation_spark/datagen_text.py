"""Deterministic text + vector fixtures for the training-data-pipeline
operators (dedup / similarity / text analysis).

Planted structure (all seeded):
- textdocs: ~72% unique sentences over a small vocab, ~8% EXACT dups of an
  earlier doc (re-cased / re-spaced, so normalization matters), ~10%
  NEAR-dups (~2% of words replaced -> word-3-gram Jaccard >= ~0.9), ~10%
  short/junky docs (quality-score fodder).
- vectors: unit-ish gaussian vectors (dim 64); ~10% near-dups of an earlier
  vector (tiny noise -> cosine > 0.99).

Precomputed signature columns (``simhash`` on textdocs, ``lsh_buckets`` /
``emb_bands`` on vectors) are generated with the SAME numpy kernels the
Spark operators run live (``conflation_spark.functions.kernels``) — the
DuckDB oracles read these columns so the banding/Hamming/cosine logic can
be expressed in SQL while Spark still computes the signatures itself.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "query", "table", "join", "scan", "merge", "filter", "window",
    "stream", "batch", "row", "column", "data", "value", "key", "sort",
    "group", "hash", "index", "cache", "shuffle", "plan", "cost", "stats",
    "fast", "slow", "small", "large", "wide", "deep", "cold", "warm",
    "north", "south", "east", "west", "alpha", "beta", "gamma", "delta",
]

SF_TEXT = {"sf0.001": 300, "sf0.01": 2000, "sf0.1": 8000, "sf1": 30000}
SF_VEC = {"sf0.001": 300, "sf0.01": 1500, "sf0.1": 6000, "sf1": 20000}
SF_MEDIA = {"sf0.001": 80, "sf0.01": 400, "sf0.1": 1600, "sf1": 6000}
SF_AUDIO = {"sf0.001": 60, "sf0.01": 300, "sf0.1": 1200, "sf1": 4000}
SF_VIDEO = {"sf0.001": 30, "sf0.01": 150, "sf0.1": 600, "sf1": 2000}
SF_JPEG = {"sf0.001": 60, "sf0.01": 300, "sf0.1": 1200, "sf1": 4000}
SF_PII = {"sf0.001": 120, "sf0.01": 800, "sf0.1": 3000, "sf1": 10000}
DIM = 64


def gen_textdocs(out_dir: str, n: int, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    kinds: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.08:  # exact dup, re-cased/spaced
            src = texts[int(rng.integers(0, i))]
            t = "  " + src.upper() if rng.random() < 0.5 else src + "  "
            kinds.append("exact_dup")
        elif i > 10 and r < 0.18:  # near dup: replace ~2% of words
            src = texts[int(rng.integers(0, i))].split()
            nrep = max(1, len(src) // 50)
            for _ in range(nrep):
                src[int(rng.integers(0, len(src)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            t = " ".join(src)
            kinds.append("near_dup")
        elif r < 0.28:  # junk
            t = " ".join(VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(int(rng.integers(1, 4))))
            if rng.random() < 0.5:
                t += "!!! ??? ;;; ,,,"
            kinds.append("junk")
        else:
            ln = int(rng.integers(40, 90))
            t = " ".join(VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(ln))
            kinds.append("base")
        texts.append(t)
    from conflation_spark.functions.kernels import simhash64

    tbl = pa.table(
        {
            "text_id": pa.array([f"t{i:06d}" for i in range(n)], pa.string()),
            "text": pa.array(texts, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "simhash": pa.array(simhash64(texts).tolist(), pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "textdocs.parquet"), row_group_size=512)


N_CLUSTERS = 48  # topical cluster centers for the vector fixture


def gen_vectors(out_dir: str, n: int, seed: int = 11) -> None:
    """Cluster-structured vectors: each base vector = one of N_CLUSTERS
    gaussian centers + noise (intra-cluster cosine ~0.75), plus ~10% planted
    near-dups (cosine > 0.99). Real embedding corpora are clustered — a
    uniform iid-gaussian corpus puts every true top-10 neighbor at cosine
    ~0.35, where NO sublinear ANN can beat a linear scan (measured: 8-bit
    LSH recall@10 = 0.16 on iid data vs 0.97 here at the same settings) —
    so the clustered fixture is both more realistic and the honest way to
    measure retrieval quality."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (N_CLUSTERS, DIM))
    vecs = np.zeros((n, DIM), dtype=np.float64)
    kinds = []
    for i in range(n):
        if i > 10 and rng.random() < 0.10:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + rng.normal(0, 0.01, DIM)
            kinds.append("near_dup")
        else:
            c = int(rng.integers(0, N_CLUSTERS))
            vecs[i] = centers[c] + rng.normal(0, 0.6, DIM)
            kinds.append("base")
    from conflation_spark.functions.kernels import (
        banded_hyperplane_signature,
        lsh_planes,
    )
    from conflation_spark.operators.dedup import (
        EMB_LSH_BANDS,
        EMB_LSH_BITS_PER_BAND,
        EMB_LSH_SEED,
    )
    from conflation_spark.operators.similarity import (
        ANN_DIM,
        ANN_N_PLANES,
        ANN_N_TABLES,
        ANN_SEED,
    )

    # one bucket id per LSH table (multi-table family; band = table)
    buckets = banded_hyperplane_signature(
        vecs, lsh_planes(ANN_N_TABLES * ANN_N_PLANES, ANN_DIM, ANN_SEED), ANN_N_TABLES
    )
    # near-dup LSH band values with the SAME kernel + family constants the
    # embedding_cosine_pairs operator uses live — the DuckDB oracle mirrors
    # the band join over this column (like `simhash` / `lsh_bucket`)
    emb_bands = banded_hyperplane_signature(
        vecs, lsh_planes(EMB_LSH_BANDS * EMB_LSH_BITS_PER_BAND, DIM, EMB_LSH_SEED), EMB_LSH_BANDS
    )
    tbl = pa.table(
        {
            "vec_id": pa.array([f"v{i:06d}" for i in range(n)], pa.string()),
            "vec": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float64())),
            "kind": pa.array(kinds, pa.string()),
            "lsh_buckets": pa.array([r.tolist() for r in buckets], pa.list_(pa.int64())),
            "emb_bands": pa.array([r.tolist() for r in emb_bands], pa.list_(pa.int64())),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "vectors.parquet"), row_group_size=512)


def gen_media_blobs(out_dir: str, n: int, seed: int = 23) -> None:
    """Real PNG image blobs + planted per-blob ground truth.

    Each row: ``content`` = genuine PNG bytes (stdlib codec, row filters
    cycling 0..4 so every decoder unfilter path runs in the fixture), and
    truth columns computed from the SOURCE pixel array before encoding:
    ``true_width``/``true_height`` and ``f0..f15`` — the quantized 4x4
    grid-mean feature (``functions/png.image_feature_grid``). PNG is
    lossless, so Spark's decode-side feature must reproduce the truth
    exactly; the DuckDB oracle simply reads the truth columns (the
    ``image_features`` correctness row IS the decoder test).

    Pixels are a deterministic gradient + noise mix (not pure noise, so
    the deflate path sees realistic compressible data); ~60% RGB, the
    rest greyscale; dims 8..72 px so the 4x4 grid hits uneven splits.
    """
    from conflation_spark.functions.png import (
        encode_png,
        image_feature_grid,
        quantize_feature,
    )

    rng = np.random.default_rng(seed)
    refs, blobs, widths, heights = [], [], [], []
    feats = np.zeros((n, 16), dtype=np.int64)
    for i in range(n):
        h = int(rng.integers(8, 73))
        w = int(rng.integers(8, 73))
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2
        if rng.random() < 0.6:
            chans = [
                np.clip(base + rng.integers(-40, 41, (h, w)) + c * 30, 0, 255)
                for c in range(3)
            ]
            arr = np.stack(chans, axis=2).astype(np.uint8)
        else:
            arr = np.clip(base + rng.integers(-40, 41, (h, w)), 0, 255).astype(np.uint8)
        refs.append(f"m{i:06d}")
        blobs.append(encode_png(arr, filter_mode="cycle"))
        widths.append(w)
        heights.append(h)
        feats[i] = quantize_feature(image_feature_grid(arr))
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["image"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_width": pa.array(widths, pa.int32()),
        "true_height": pa.array(heights, pa.int32()),
    }
    for j in range(16):
        cols[f"f{j}"] = pa.array(feats[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "media_blobs.parquet"), row_group_size=128
    )


def gen_jpeg_blobs(out_dir: str, n: int, seed: int = 37, quality: int = 90) -> None:
    """Real baseline JPEG blobs + planted truth — the COMPRESSED-format
    counterpart of ``gen_media_blobs``: content = genuine T.81 baseline
    JFIF bytes (`functions/jpeg.py`, Annex K tables, 4:4:4), truth =
    width / height plus the quantized 4x4 grid-mean feature of the
    SOURCE pixels. JPEG is LOSSY: the decode-side feature matches the
    truth within a tolerance (quantization + IDCT error), so the
    `jpeg_features` oracle row gates `|decoded - truth| <= JPEG_FEAT_TOL`
    rather than bit-equality. Pixels mirror the PNG fixture's gradient +
    noise mix; ~60% RGB (half of them 4:2:0-subsampled — the dominant
    real-world layout — exercising the MCU-interleaved decode), rest
    greyscale; ~1/3 of all blobs use the NON-INTERLEAVED multi-scan
    layout (one SOS per component) and another ~1/4 are PROGRESSIVE
    (SOF2, spectral selection + successive approximation) so both
    per-scan decode paths sit under the oracle gate; ~1/5 of all blobs
    additionally carry DRI + RSTn restart markers (predictor/EOB-run
    resets); dims 8..72 px."""
    from conflation_spark.functions.jpeg import encode_jpeg, encode_jpeg_progressive
    from conflation_spark.functions.png import image_feature_grid, quantize_feature

    rng = np.random.default_rng(seed)
    refs, blobs, widths, heights = [], [], [], []
    feats = np.zeros((n, 16), dtype=np.int64)
    for i in range(n):
        h = int(rng.integers(8, 73))
        w = int(rng.integers(8, 73))
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2
        if rng.random() < 0.6:
            chans = [
                np.clip(base + rng.integers(-40, 41, (h, w)) + c * 30, 0, 255)
                for c in range(3)
            ]
            arr = np.stack(chans, axis=2).astype(np.uint8)
        else:
            arr = np.clip(base + rng.integers(-40, 41, (h, w)), 0, 255).astype(np.uint8)
        refs.append(f"j{i:06d}")
        sub = "420" if arr.ndim == 3 and rng.random() < 0.5 else "444"
        layout = rng.random()
        ri = 3 if rng.random() < 0.2 else 0
        if layout < 0.25:
            blobs.append(
                encode_jpeg_progressive(
                    arr, quality=quality, subsampling=sub, restart_interval=ri
                )
            )
        else:
            blobs.append(
                encode_jpeg(
                    arr,
                    quality=quality,
                    subsampling=sub,
                    interleave=layout >= 0.55,
                    restart_interval=ri,
                )
            )
        widths.append(w)
        heights.append(h)
        feats[i] = quantize_feature(image_feature_grid(arr))
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["image"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_width": pa.array(widths, pa.int32()),
        "true_height": pa.array(heights, pa.int32()),
    }
    for j in range(16):
        cols[f"f{j}"] = pa.array(feats[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "jpeg_blobs.parquet"), row_group_size=128
    )


def gen_audio_blobs(out_dir: str, n: int, seed: int = 29) -> None:
    """Real 16-bit PCM WAV blobs + planted truth — the audio analog of
    ``gen_media_blobs``: content = genuine RIFF/WAVE bytes (stdlib codec,
    `functions/wav.py`), truth columns (sample_rate / n_samples /
    n_channels / quantized 16-segment mean-abs feature) computed from the
    SOURCE samples before encoding. PCM is lossless, so the Spark-side
    decode must reproduce the truth exactly (`audio_features` oracle).
    Waveforms are sine mixtures + noise at varied rates/lengths, ~40%
    stereo."""
    from conflation_spark.functions.wav import (
        audio_feature_segments,
        encode_wav,
        quantize_feature,
    )

    rng = np.random.default_rng(seed)
    rates = [8000, 16000, 22050]
    refs, blobs, srs, lens, chs = [], [], [], [], []
    feats = np.zeros((n, 16), dtype=np.int64)
    for i in range(n):
        sr = int(rates[int(rng.integers(0, len(rates)))])
        nsamp = int(rng.integers(sr // 20, sr // 4))  # 50-250 ms
        ch = 2 if rng.random() < 0.4 else 1
        t = np.arange(nsamp) / sr
        wave = np.zeros((nsamp, ch))
        for _ in range(int(rng.integers(1, 4))):
            f = rng.uniform(80, 2000)
            amp = rng.uniform(0.05, 0.4)
            ph = rng.uniform(0, 2 * np.pi, ch)
            wave += amp * np.sin(2 * np.pi * f * t[:, None] + ph)
        wave += rng.normal(0, 0.02, (nsamp, ch))
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        refs.append(f"a{i:06d}")
        blobs.append(encode_wav(s, sr))
        srs.append(sr)
        lens.append(nsamp)
        chs.append(ch)
        feats[i] = quantize_feature(audio_feature_segments(s))
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["audio"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_sample_rate": pa.array(srs, pa.int32()),
        "true_n_samples": pa.array(lens, pa.int64()),
        "true_n_channels": pa.array(chs, pa.int32()),
    }
    for j in range(16):
        cols[f"a{j}"] = pa.array(feats[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "audio_blobs.parquet"), row_group_size=128
    )


def gen_video_blobs(out_dir: str, n: int, seed: int = 31) -> None:
    """Real Y4M (uncompressed YUV4MPEG2) video blobs + planted truth —
    closing the video modality like PNG/WAV closed image/audio: content
    = genuine Y4M streams (`functions/y4m.py`), truth = width / height /
    n_frames plus the quantized mean luma of frames 0, 2, 4 (the default
    frame-sampling stride) computed from the SOURCE planes. Every blob
    has >= 5 frames so the three sampled positions always exist."""
    from conflation_spark.functions.y4m import encode_y4m, frame_luma_mean, quantize

    rng = np.random.default_rng(seed)
    refs, blobs, ws, hs, nfs = [], [], [], [], []
    means = np.zeros((n, 3), dtype=np.int64)
    for i in range(n):
        h = int(rng.integers(8, 33)) * 2
        w = int(rng.integers(8, 33)) * 2
        nf = int(rng.integers(5, 10))
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2
        frames = np.zeros((nf, h, w), dtype=np.uint8)
        for t in range(nf):
            frames[t] = np.clip(
                base + rng.integers(-30, 31, (h, w)) + t * 10, 0, 255
            ).astype(np.uint8)
        refs.append(f"vid{i:06d}")
        blobs.append(encode_y4m(frames))
        ws.append(w)
        hs.append(h)
        nfs.append(nf)
        for j, fi in enumerate((0, 2, 4)):
            means[i, j] = quantize(frame_luma_mean(frames[fi]))
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["video"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_width": pa.array(ws, pa.int32()),
        "true_height": pa.array(hs, pa.int32()),
        "true_n_frames": pa.array(nfs, pa.int32()),
    }
    for j in range(3):
        cols[f"m{j}"] = pa.array(means[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "video_blobs.parquet"), row_group_size=64
    )


def gen_pii_docs(out_dir: str, n: int, seed: int = 13) -> None:
    """Docs with PLANTED PII tokens (emails / IPv4s / +cc-ddd-ddd-dddd
    phones) at seeded positions among vocab words, plus truth columns
    n_emails/n_ips/n_phones counted at generation — the scrub_pii
    operator and its DuckDB twin must both recover these counts exactly.
    PII tokens are space-delimited and never adjacent to digits, so the
    three patterns cannot overlap each other or the surrounding text."""
    rng = np.random.default_rng(seed)
    tlds = ["com", "org", "net", "io"]
    texts, n_em, n_ip, n_ph = [], [], [], []
    for _ in range(n):
        words = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(int(rng.integers(10, 40)))]
        ne = int(rng.choice([0, 1, 2], p=[0.45, 0.35, 0.2]))
        ni = int(rng.random() < 0.3)
        np_ = int(rng.random() < 0.3)
        pii = []
        for _ in range(ne):
            w = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(3)]
            pii.append(f"{w[0]}.{w[1]}@{w[2]}.{tlds[int(rng.integers(0, len(tlds)))]}")
        for _ in range(ni):
            pii.append(".".join(str(int(rng.integers(1, 255))) for _ in range(4)))
        for _ in range(np_):
            cc = int(rng.integers(1, 99))
            a, b, c = (int(rng.integers(0, 10 ** k)) for k in (3, 3, 4))
            pii.append(f"+{cc}-{a:03d}-{b:03d}-{c:04d}")
        for tok in pii:
            words.insert(int(rng.integers(0, len(words) + 1)), tok)
        texts.append(" ".join(words))
        n_em.append(ne)
        n_ip.append(ni)
        n_ph.append(np_)
    tbl = pa.table(
        {
            "pii_id": pa.array([f"p{i:06d}" for i in range(n)], pa.string()),
            "text": pa.array(texts, pa.string()),
            "true_emails": pa.array(n_em, pa.int64()),
            "true_ips": pa.array(n_ip, pa.int64()),
            "true_phones": pa.array(n_ph, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "pii_docs.parquet"), row_group_size=512)


SF_GIF = {"sf0.001": 60, "sf0.01": 300, "sf0.1": 1200, "sf1": 4000}


def gen_gif_blobs(out_dir: str, n: int, seed: int = 43) -> None:
    """Real GIF blobs + planted truth — the palette-indexed image format
    (`functions/gif.py`): content = genuine GIF89a bytes (LZW, ~50%
    interlaced, ~30% local-color-table layout, most carrying graphic
    control + comment extensions the decoder must skip), truth = width /
    height plus the quantized 4x4 grid-mean feature of ``palette[idx]``
    — the exact pixels a correct decode returns, GIF being lossless for
    indexed content. Same exact-hash oracle design as PNG."""
    from conflation_spark.functions.gif import encode_gif
    from conflation_spark.functions.kernels import area_resize
    from conflation_spark.functions.png import image_feature_grid, quantize_feature
    from conflation_spark.operators.multimodal import RESIZE_MAX_SIDE
    import hashlib

    rng = np.random.default_rng(seed)
    refs, blobs, widths, heights = [], [], [], []
    rs_ws, rs_hs, rs_md5s = [], [], []
    feats = np.zeros((n, 16), dtype=np.int64)
    for i in range(n):
        h = int(rng.integers(8, 73))
        w = int(rng.integers(8, 73))
        n_pal = int(rng.integers(8, 257))
        pal = rng.integers(0, 256, (n_pal, 3)).astype(np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        base = yy * (n_pal - 1) // max(h - 1, 1) + xx * (n_pal - 1) // max(w - 1, 1)
        idx = ((base // 2 + rng.integers(0, 5, (h, w))) % n_pal).astype(np.uint8)
        refs.append(f"g{i:06d}")
        blobs.append(
            encode_gif(
                pal,
                idx,
                interlace=bool(rng.random() < 0.5),
                local_table=bool(rng.random() < 0.3),
                extensions=bool(rng.random() < 0.75),
            )
        )
        widths.append(w)
        heights.append(h)
        px = pal[idx]
        feats[i] = quantize_feature(image_feature_grid(px))
        # resize truth from SOURCE pixels (GIF is lossless for indexed
        # content, so a correct decode+resize reproduces this exactly)
        rs = area_resize(px, RESIZE_MAX_SIDE)
        rs_ws.append(rs.shape[1])
        rs_hs.append(rs.shape[0])
        rs_md5s.append(hashlib.md5(rs.tobytes()).hexdigest())
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["image"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_width": pa.array(widths, pa.int32()),
        "true_height": pa.array(heights, pa.int32()),
        "rs_w": pa.array(rs_ws, pa.int32()),
        "rs_h": pa.array(rs_hs, pa.int32()),
        "rs_md5": pa.array(rs_md5s, pa.string()),
    }
    for j in range(16):
        cols[f"f{j}"] = pa.array(feats[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "gif_blobs.parquet"), row_group_size=128
    )


def ensure_gif_fixture(sf_name: str, root: str | None = None) -> str:
    """GIF blobs live in their own fixture dir with their own marker so
    adding them never regenerates the (expensive) main text fixture."""
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "gif"
    )
    if sf_name not in SF_GIF:
        sf_name = "sf0.01"
    out = os.path.join(root, sf_name)
    marker = os.path.join(out, "_SUCCESS_v2")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    gen_gif_blobs(out, SF_GIF[sf_name])
    with open(marker, "w") as f:
        f.write("ok")
    return out


SF_FLAC = {"sf0.001": 24, "sf0.01": 100, "sf0.1": 300, "sf1": 900}


def gen_flac_blobs(out_dir: str, n: int, seed: int = 53) -> None:
    """Real COMPRESSED audio blobs + planted truth — genuine FLAC
    streams (`functions/flac.py`) with the encoder knobs swept so the
    fixture exercises every decode path: mono/stereo with all four
    channel assignments (auto cost-picked plus forced modes), FIXED and
    genuine Levinson-Durbin LPC subframes, rice AND rice2 residual
    methods, escaped raw partitions, partition orders 0-2, wasted bits,
    varied block sizes (incl. partial last frames and the explicit
    8/16-bit header field), and an off-table sample rate (12000 Hz,
    16-bit end-of-header field). Truth columns (sample_rate / n_samples
    / n_channels / quantized 16-segment mean-abs feature) are computed
    from the SOURCE samples BEFORE encoding; FLAC is lossless, so the
    Spark-side decode must reproduce them exactly (`flac_features`
    oracle — same gate design as the WAV/GIF rows)."""
    from conflation_spark.functions.flac import encode_flac
    from conflation_spark.functions.wav import (
        AUDIO_SPECTRUM_NFFT,
        audio_feature_segments,
        quantize_feature,
        spectral_band_energies,
    )

    rng = np.random.default_rng(seed)
    rates = [8000, 16000, 22050, 12000]
    modes = ["auto", "independent", "left_side", "right_side", "mid_side"]
    refs, blobs, srs, lens, chs, nffts = [], [], [], [], [], []
    feats = np.zeros((n, 16), dtype=np.int64)
    specs = np.zeros((n, 8), dtype=np.int64)
    for i in range(n):
        sr = int(rates[int(rng.integers(0, len(rates)))])
        nsamp = int(rng.integers(sr // 20, sr // 4))  # 50-250 ms
        ch = 2 if rng.random() < 0.5 else 1
        t = np.arange(nsamp) / sr
        wave = np.zeros((nsamp, ch))
        for _ in range(int(rng.integers(1, 4))):
            f = rng.uniform(80, 2000)
            amp = rng.uniform(0.05, 0.4)
            ph = rng.uniform(0, 2 * np.pi, ch)
            wave += amp * np.sin(2 * np.pi * f * t[:, None] + ph)
        wave += rng.normal(0, 0.02, (nsamp, ch))
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        if rng.random() < 0.15:  # wasted-bits path: zero the low 2 bits
            s = ((s.astype(np.int32) >> 2) << 2).astype(np.int16)
        mode = modes[int(rng.integers(0, len(modes)))] if ch == 2 else "auto"
        blob = encode_flac(
            s,
            sr,
            block_size=int(rng.choice([192, 250, 256, 576, 1024])),
            stereo_mode=mode,
            lpc_order=int(rng.choice([0, 0, 2, 4, 8])),
            rice2=bool(rng.random() < 0.3),
            partition_order=int(rng.choice([0, 1, 2])),
            force_escape=bool(rng.random() < 0.15),
        )
        refs.append(f"f{i:06d}")
        blobs.append(blob)
        srs.append(sr)
        lens.append(nsamp)
        chs.append(ch)
        nffts.append(nsamp // AUDIO_SPECTRUM_NFFT)
        feats[i] = quantize_feature(audio_feature_segments(s))
        # frequency-domain truth, also from the SOURCE samples: relative
        # 8-band spectral energies (lossless decode reproduces exactly)
        specs[i] = quantize_feature(spectral_band_energies(s))
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["audio"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_sample_rate": pa.array(srs, pa.int32()),
        "true_n_samples": pa.array(lens, pa.int64()),
        "true_n_channels": pa.array(chs, pa.int32()),
        "true_n_fft_frames": pa.array(nffts, pa.int32()),
    }
    for j in range(16):
        cols[f"a{j}"] = pa.array(feats[:, j].tolist(), pa.int64())
    for j in range(8):
        cols[f"s{j}"] = pa.array(specs[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "flac_blobs.parquet"), row_group_size=8
    )


def ensure_flac_fixture(sf_name: str, root: str | None = None) -> str:
    """FLAC blobs live in their own fixture dir with their own marker
    (same isolation rationale as the GIF/H.264 fixtures)."""
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "flac"
    )
    if sf_name not in SF_FLAC:
        sf_name = "sf0.01"
    out = os.path.join(root, sf_name)
    marker = os.path.join(out, "_SUCCESS_v2")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    gen_flac_blobs(out, SF_FLAC[sf_name])
    with open(marker, "w") as f:
        f.write("ok")
    return out


SF_H264 = {"sf0.001": 24, "sf0.01": 100, "sf0.1": 400, "sf1": 1200}


def gen_h264_blobs(out_dir: str, n: int, seed: int = 47) -> None:
    """Real COMPRESSED video blobs + planted truth — genuine Annex-B
    H.264 baseline I-frame streams (`functions/h264.py`: CAVLC,
    Intra_16x16 V/H/DC/Plane prediction, cropping; ~1/4 of blobs
    interleave I_PCM macroblocks). Truth = width / height / n_frames
    plus quantized Y/U/V plane means of the sampled frames 0/2/4 taken
    from the ENCODER'S RECONSTRUCTION loop, which is bit-exact with a
    correct decode of the bitstream (H.264 inverse transforms are
    integer-exact and the encoder reconstructs through the decoder's
    own helpers) — so the `h264_frames` oracle gates the decoder
    EXACTLY, GIF-style, despite the codec being lossy vs the source.
    The non-circular quality bound vs SOURCE pixels lives in
    tests/test_h264.py. QP varies 20..32; dims include
    non-multiple-of-16 (cropped) layouts."""
    from conflation_spark.functions.h264 import encode_h264_with_recon
    from conflation_spark.functions.y4m import frame_luma_mean, quantize

    rng = np.random.default_rng(seed)
    refs, blobs, ws, hs, nfs = [], [], [], [], []
    means = np.zeros((n, 9), dtype=np.int64)  # y0..2, u0..2, v0..2
    for i in range(n):
        h = int(rng.integers(8, 33)) * 2
        w = int(rng.integers(8, 33)) * 2
        nf = int(rng.integers(5, 9))
        qp = int(rng.choice([20, 24, 28, 32]))
        pcm = 5 if rng.random() < 0.25 else 0
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2
        frames = np.stack(
            [
                np.clip(base + rng.integers(-30, 31, (h, w)) + t * 10, 0, 255)
                for t in range(nf)
            ]
        ).astype(np.uint8)
        bs, ry, ru, rv = encode_h264_with_recon(frames, qp=qp, pcm_every=pcm)
        refs.append(f"avc{i:06d}")
        blobs.append(bs)
        ws.append(w)
        hs.append(h)
        nfs.append(nf)
        for j, fi in enumerate((0, 2, 4)):
            means[i, j] = quantize(frame_luma_mean(ry[fi]))
            means[i, 3 + j] = quantize(frame_luma_mean(ru[fi]))
            means[i, 6 + j] = quantize(frame_luma_mean(rv[fi]))
    cols = {
        "media_ref": pa.array(refs, pa.string()),
        "media_kind": pa.array(["video"] * n, pa.string()),
        "content": pa.array(blobs, pa.binary()),
        "true_width": pa.array(ws, pa.int32()),
        "true_height": pa.array(hs, pa.int32()),
        "true_n_frames": pa.array(nfs, pa.int32()),
    }
    for j, name in enumerate(
        ["m0", "m1", "m2", "u0", "u1", "u2", "v0", "v1", "v2"]
    ):
        cols[name] = pa.array(means[:, j].tolist(), pa.int64())
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, "h264_blobs.parquet"), row_group_size=8
    )


def ensure_h264_fixture(sf_name: str, root: str | None = None) -> str:
    """H.264 blobs live in their own fixture dir with their own marker
    (same isolation rationale as the GIF fixture)."""
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "h264"
    )
    if sf_name not in SF_H264:
        sf_name = "sf0.01"
    out = os.path.join(root, sf_name)
    marker = os.path.join(out, "_SUCCESS_v2")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    gen_h264_blobs(out, SF_H264[sf_name])
    with open(marker, "w") as f:
        f.write("ok")
    return out


def ensure_text_fixture(sf_name: str, root: str | None = None) -> str:
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "text"
    )
    if sf_name not in SF_TEXT:
        sf_name = "sf0.01"
    out = os.path.join(root, sf_name)
    marker = os.path.join(out, "_SUCCESS_v13")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    gen_textdocs(out, SF_TEXT[sf_name])
    gen_vectors(out, SF_VEC[sf_name])
    gen_media_blobs(out, SF_MEDIA[sf_name])
    gen_audio_blobs(out, SF_AUDIO[sf_name])
    gen_video_blobs(out, SF_VIDEO[sf_name])
    gen_jpeg_blobs(out, SF_JPEG[sf_name])
    gen_pii_docs(out, SF_PII[sf_name])
    with open(marker, "w") as f:
        f.write("ok")
    return out


if __name__ == "__main__":
    import sys

    print(ensure_text_fixture(sys.argv[1] if len(sys.argv) > 1 else "sf0.01"))
