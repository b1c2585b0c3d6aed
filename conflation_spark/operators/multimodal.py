"""Multimodal column handling: image/audio/video as opaque binary + metadata.

Media rides in documents as ``kind='media'`` spans (``media_ref`` keys into
a blobs table), mirroring the reference where every trace point IS an image
(Mapillary image ids, /root/reference/conflation/trace_fetching/mapillary.py:41,448-456).

ALL THREE modalities decode for REAL inside ``mapInPandas`` kernels with
pure-stdlib/numpy codecs: images as PNG (chunk/CRC parsing + inflate +
all five unfilters, ``functions/png.py``), baseline+progressive JPEG
(T.81 Huffman/dequant/IDCT, ``functions/jpeg.py``) and GIF (LZW +
color tables + interlace, ``functions/gif.py``); 16-bit PCM WAV audio
(RIFF/fmt/data parsing, ``functions/wav.py``) plus compressed FLAC
(full baseline decode: fixed+LPC predictors, rice/rice2 residuals,
all stereo decorrelation modes, CRC-8/16 + MD5 validation,
``functions/flac.py``); uncompressed Y4M video
(stream header + FRAME markers + 4:2:0 planes, ``functions/y4m.py``)
AND compressed H.264 baseline I-frame video (Annex-B NAL + CAVLC +
intra reconstruction, ``functions/h264.py``) — no PIL/libsndfile/
ffmpeg dependency anywhere. The rare formats with no decoder in this
environment (hierarchical JPEG, CABAC/inter H.264 profiles) go through
the injectable ``decoder`` seams, and ``sample_frames`` keeps a
deterministic digest sampler for opaque containers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conflation_spark.functions.png import decode_png, image_feature_grid
from conflation_spark.functions.wav import audio_feature_segments, decode_wav

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, content_sha256 string"
)
IMAGE_FEATURE_SCHEMA = (
    "media_ref string, width int, height int, feature array<double>"
)
AUDIO_FEATURE_SCHEMA = (
    "media_ref string, sample_rate int, n_samples long, n_channels int, "
    "feature array<double>"
)
FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame_sha1 string"

FEATURE_DIM = 16

# max |decoded - source| per grid-mean feature element (features live in
# [0, 1]) tolerated for a q90 JPEG decode. Quantization + IDCT error
# averages out over a grid cell, but TINY 4:2:0 images (grid cells of
# ~2-3 px) legitimately reach ~0.026 on noisy content — chroma
# subsampling error has nothing to average over (measured tail over 600
# fixture-style images: 0.018; worst observed fixture draw: 0.0257).
# 0.035 covers that tail while still failing loudly on a real decoder
# defect (a broken unfilter/Huffman/refinement path is off by >= 0.1)
JPEG_FEAT_TOL = 0.035


def synth_blobs(spark, documents: DataFrame) -> DataFrame:
    """Deterministic fake blob table for every media_ref in the documents
    (content = repeated sha-derived bytes; stands in for real object-store
    payloads). Used by the METADATA path, whose oracle must rebuild the
    bytes in SQL — for real decodable image content use the fixture's
    ``media_blobs.parquet`` (datagen_text.gen_media_blobs)."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.media_ref") != "")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    payload = F.unhex(F.sha2(F.col("media_ref").cast("binary"), 256))
    # kind from the ref's last char (ascii % 3): deterministic AND
    # expressible in DuckDB (crc32 is not), so media_metadata has an oracle
    kind_n = F.ascii(F.substring(F.col("media_ref"), -1, 1)) % 3
    return refs.withColumn("content", payload).withColumn(
        "media_kind",
        F.when(kind_n == 0, "image").when(kind_n == 1, "audio").otherwise("video"),
    )


def decode_image(content: bytes) -> tuple[int, int, np.ndarray]:
    """Real image decode: PNG bytes -> (width, height, 16-dim float64
    feature = 4x4 grid of mean pixel intensity). Raises ValueError on
    non-PNG/corrupt input — a pipeline batches bad blobs into a quarantine
    via try/except in its own kernel if it wants salvage semantics."""
    arr = decode_png(content)
    h, w = arr.shape[:2]
    return w, h, image_feature_grid(arr)


def decode_jpeg_image(content: bytes) -> tuple[int, int, np.ndarray]:
    """Real COMPRESSED image decode: baseline JPEG bytes -> (width,
    height, 16-dim grid-mean feature) via the pure-numpy T.81 decoder
    (`functions/jpeg.py`). Plugs into ``extract_image_features`` through
    the same ``decoder`` seam the PNG path uses — proving the seam takes
    a real second format, not just the injected-fake tests. JPEG is
    lossy, so features match planted source-pixel truth within a
    tolerance, not bit-for-bit (see the `jpeg_features` query)."""
    from conflation_spark.functions.jpeg import decode_jpeg

    arr = decode_jpeg(content)
    h, w = arr.shape[:2]
    return w, h, image_feature_grid(arr)


def decode_gif_image(content: bytes) -> tuple[int, int, np.ndarray]:
    """Real palette-indexed image decode: GIF87a/89a bytes -> (width,
    height, 16-dim grid-mean feature) via the pure-stdlib LZW decoder
    (`functions/gif.py` — color tables, interlacing, extension-block
    skipping). Third real format through the ``decoder`` seam; GIF is
    lossless for indexed content, so the `gif_features` oracle is
    exact-hash like PNG, not tolerance-gated like JPEG."""
    from conflation_spark.functions.gif import decode_gif

    arr = decode_gif(content)
    h, w = arr.shape[:2]
    return w, h, image_feature_grid(arr)


def media_metadata(blobs: DataFrame) -> DataFrame:
    """Typed metadata over the binary column — pure column ops.

    The content digest is sha256 over the UPPERCASE HEX encoding of the
    bytes (not the raw bytes): engine-portable — DuckDB 1.0 can hash
    VARCHAR but not BLOB, so this form has an exact SQL oracle while
    staying a collision-resistant fingerprint of the binary content.
    """
    return blobs.select(
        "media_ref",
        "media_kind",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2(F.hex("content"), 256).alias("content_sha256"),
    )


def extract_image_features(blobs: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas over binary content -> (width, height, feature[16]).

    Arrow binary batches in, a REAL stdlib PNG decode per blob (see
    ``functions/png.py``), float64 features out. Stateless per batch, no
    driver collection; ``decoder`` is injectable for tests/other formats.
    """
    decode = decoder or decode_image

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                w, h, feat = decode(bytes(content))
                rows.append((ref, w, h, [float(x) for x in feat]))
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height", "feature"])

    imgs = blobs.where(F.col("media_kind") == "image").select("media_ref", "content")
    # the decode-stage lesson (see extract_compressed_video_frames): blob
    # files fit one scan split, so without an EXPLICIT-count repartition
    # the pure-Python decode runs serially in 1-2 scan tasks
    n_dec = 2 * imgs.sparkSession.sparkContext.defaultParallelism
    return imgs.repartition(n_dec, F.col("media_ref")).mapInPandas(
        op, schema=IMAGE_FEATURE_SCHEMA
    )


def decode_audio(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real audio decode: 16-bit PCM WAV bytes -> (sample_rate, n_samples,
    n_channels, 16-segment mean-abs feature). Raises ValueError on
    non-PCM/corrupt input (`functions/wav.py`)."""
    samples, sr = decode_wav(content)
    return sr, samples.shape[0], samples.shape[1], audio_feature_segments(samples)


def decode_flac_audio(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real COMPRESSED audio decode: FLAC bytes -> (sample_rate,
    n_samples, n_channels, 16-segment mean-abs feature). The full
    bitstream parse lives in `functions/flac.py`; FLAC is lossless, so
    the feature equals the source-sample feature exactly (the
    `flac_features` oracle gate). Raises ValueError on corrupt input
    (CRC/MD5/framing are all validated)."""
    from conflation_spark.functions.flac import decode_flac

    samples, sr = decode_flac(content)
    return sr, samples.shape[0], samples.shape[1], audio_feature_segments(samples)


def decode_flac_spectrum(content: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC decode + spectral analysis: -> (sample_rate, n_fft_frames,
    8-band relative spectral energy). The band energies come from the
    shared `functions/wav.spectral_band_energies` reduction, so planted
    source-sample truth gates the decode exactly (lossless)."""
    from conflation_spark.functions.flac import decode_flac
    from conflation_spark.functions.wav import (
        AUDIO_SPECTRUM_NFFT,
        spectral_band_energies,
    )

    samples, sr = decode_flac(content)
    return sr, samples.shape[0] // AUDIO_SPECTRUM_NFFT, spectral_band_energies(samples)


def extract_audio_spectrum(blobs: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas over binary content -> (sample_rate, n_fft_frames,
    feature[8] relative band energies) — the frequency-domain sibling of
    ``extract_audio_features``; FLAC decode by default."""
    decode = decoder or decode_flac_spectrum

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                sr, nf, feat = decode(bytes(content))
                rows.append((ref, sr, nf, [float(x) for x in feat]))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "sample_rate", "n_fft_frames", "feature"],
            )

    auds = blobs.where(F.col("media_kind") == "audio").select("media_ref", "content")
    # same explicit-count hash spread as the H.264 stage (CLAUDE.md blob
    # -kernel rule): compressed audio decode (FLAC's per-sample LPC loop)
    # is CPU-bound while the blobs fit one scan split, and repartition(col)
    # alone gets AQE-coalesced back into a single decode task
    n_dec = 2 * auds.sparkSession.sparkContext.defaultParallelism
    return auds.repartition(n_dec, F.col("media_ref")).mapInPandas(
        op,
        schema="media_ref string, sample_rate int, n_fft_frames int, feature array<double>",
    )


def extract_audio_features(blobs: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas over binary content -> (sample_rate, n_samples,
    n_channels, feature[16]) — the audio twin of
    ``extract_image_features``; a REAL RIFF/PCM parse per blob."""
    decode = decoder or decode_audio

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                sr, n, ch, feat = decode(bytes(content))
                rows.append((ref, sr, n, ch, [float(x) for x in feat]))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "sample_rate", "n_samples", "n_channels", "feature"],
            )

    auds = blobs.where(F.col("media_kind") == "audio").select("media_ref", "content")
    # explicit-count hash spread (CLAUDE.md blob-kernel rule): with the
    # injected FLAC decoder the kernel is CPU-bound while the compressed
    # blobs fit one scan split — without the explicit count AQE coalesces
    # the decode back into a single task
    n_dec = 2 * auds.sparkSession.sparkContext.defaultParallelism
    return auds.repartition(n_dec, F.col("media_ref")).mapInPandas(
        op, schema=AUDIO_FEATURE_SCHEMA
    )


VIDEO_FRAME_SCHEMA = (
    "media_ref string, frame_idx int, width int, height int, y_mean_c long"
)


def decode_video_frames(content: bytes, every_n: int = 2, max_frames: int = 3):
    """Real video decode for uncompressed Y4M streams
    (`functions/y4m.py`): yields (frame_idx, width, height, quantized
    mean luma) for frames 0, every_n, 2*every_n, ... up to max_frames.
    Raises ValueError on non-Y4M/corrupt input; compressed codecs have
    no decoder in this environment and go through the injectable
    ``decoder`` seam of ``extract_video_frames``."""
    from conflation_spark.functions.y4m import decode_y4m, frame_luma_mean, quantize

    frames, w, h = decode_y4m(content)
    out = []
    for j in range(max_frames):
        fi = j * every_n
        if fi >= frames.shape[0]:
            break
        out.append((fi, w, h, quantize(frame_luma_mean(frames[fi]))))
    return out


def extract_video_frames(
    blobs: DataFrame, every_n: int = 2, max_frames: int = 3, decoder=None
) -> DataFrame:
    """mapInPandas over binary content -> one row per sampled frame
    (frame_idx, width, height, y_mean_c) — REAL Y4M parsing by default;
    ``decoder`` is the seam for other containers."""
    decode = decoder or (
        lambda content: decode_video_frames(content, every_n, max_frames)
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                for fi, w, h, m in decode(bytes(content)):
                    rows.append((ref, fi, w, h, m))
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "width", "height", "y_mean_c"]
            )

    vids = blobs.where(F.col("media_kind") == "video").select("media_ref", "content")
    return vids.mapInPandas(op, schema=VIDEO_FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_ref string, src_width int, src_height int, "
    "width int, height int, px_md5 string"
)
RESIZE_MAX_SIDE = 24


def resize_images(blobs: DataFrame, max_side: int = RESIZE_MAX_SIDE, decoder=None) -> DataFrame:
    """Thumbnail/resize over binary image blobs — the third multimodal
    verb alongside decode, feature-extract and frame-sample: decode in
    the kernel (default PNG; ``decoder`` must return the raw pixel
    array, so any of the real codecs plugs in), exact integer area-mean
    downsample (`functions/kernels.area_resize` — bit-deterministic, so
    lossless-format fixtures can plant EXACT resized-pixel truth), and
    emit the resized raster's md5 plus source/output dims. A real
    pipeline would write the resized bytes to an object store; the
    digest is the testable core of that without parking megabytes in
    the oracle gate."""
    from conflation_spark.functions.kernels import area_resize
    from conflation_spark.functions.png import decode_png

    decode = decoder or decode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                arr = decode(bytes(content))
                out = area_resize(arr, max_side)
                rows.append(
                    (
                        ref,
                        arr.shape[1],
                        arr.shape[0],
                        out.shape[1],
                        out.shape[0],
                        hashlib.md5(out.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "src_width", "src_height", "width", "height", "px_md5",
                ],
            )

    imgs = blobs.where(F.col("media_kind") == "image").select("media_ref", "content")
    # explicit-count decode repartition (see extract_image_features)
    n_dec = 2 * imgs.sparkSession.sparkContext.defaultParallelism
    return imgs.repartition(n_dec, F.col("media_ref")).mapInPandas(
        op, schema=RESIZE_SCHEMA
    )


H264_FRAME_SCHEMA = (
    "media_ref string, frame_idx int, width int, height int, "
    "y_mean_c long, u_mean_c long, v_mean_c long"
)


def decode_h264_frame_stats(content: bytes, every_n: int = 2, max_frames: int = 3):
    """Real COMPRESSED video decode: Annex-B H.264 baseline I-frame
    streams (`functions/h264.py` — NAL/SPS/PPS parse, CAVLC entropy
    decode, intra reconstruction, cropping). Yields (frame_idx, width,
    height, quantized Y/U/V plane means) for frames 0, every_n, ... —
    the sampled-frame stats a dedup/quality pass runs on. Raises
    ValueError on corrupt streams or unsupported profiles (CABAC,
    P/B slices); those route to the injectable ``decoder`` seam of
    ``extract_compressed_video_frames``."""
    from conflation_spark.functions.h264 import decode_h264
    from conflation_spark.functions.y4m import frame_luma_mean, quantize

    y, u, v, w, h = decode_h264(content)
    out = []
    for j in range(max_frames):
        fi = j * every_n
        if fi >= y.shape[0]:
            break
        out.append(
            (
                fi,
                w,
                h,
                quantize(frame_luma_mean(y[fi])),
                quantize(frame_luma_mean(u[fi])),
                quantize(frame_luma_mean(v[fi])),
            )
        )
    return out


def extract_compressed_video_frames(
    blobs: DataFrame, every_n: int = 2, max_frames: int = 3, decoder=None
) -> DataFrame:
    """mapInPandas over compressed video blobs -> one row per sampled
    frame with Y/U/V plane stats — the H.264 twin of
    ``extract_video_frames`` (which handles uncompressed Y4M); the
    ``decoder`` parameter stays the seam for codecs with no decoder in
    this environment."""
    decode = decoder or (
        lambda content: decode_h264_frame_stats(content, every_n, max_frames)
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                for fi, w, h, ym, um, vm in decode(bytes(content)):
                    rows.append((ref, fi, w, h, ym, um, vm))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "width", "height",
                    "y_mean_c", "u_mean_c", "v_mean_c",
                ],
            )

    vids = blobs.where(F.col("media_kind") == "video").select("media_ref", "content")
    # entropy decode is CPU-bound at ~100x the scan cost per byte, and
    # compressed blobs are small: a whole shard of streams can land under
    # one maxPartitionBytes split (the single-task trap). Hash-spread the
    # blobs first — the shuffle moves only the (tiny) coded bytes and buys
    # full-core decode parallelism at any scale. The partition count must
    # be EXPLICIT: with repartition(col) alone AQE sees a few-MB shuffle
    # and coalesces the decode stage back into one task.
    n_dec = 2 * vids.sparkSession.sparkContext.defaultParallelism
    return vids.repartition(n_dec, F.col("media_ref")).mapInPandas(
        op, schema=H264_FRAME_SCHEMA
    )


def sample_frames(blobs: DataFrame, every_n: int = 2, n_frames: int = 3) -> DataFrame:
    """Frame-sampling plumbing for OPAQUE video containers (formats with
    no decoder here): mapInPandas emitting n_frames digest rows per blob.
    For real decoding of uncompressed Y4M streams use
    ``extract_video_frames``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                for i in range(0, n_frames * every_n, every_n):
                    digest = hashlib.sha1(bytes(content) + i.to_bytes(4, "big")).hexdigest()
                    rows.append((ref, i, digest))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "frame_sha1"])

    vids = blobs.where(F.col("media_kind") == "video").select("media_ref", "content")
    return vids.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)
