"""Unit tests for the pure-numpy baseline JPEG codec (functions/jpeg.py) —
no Spark. JPEG is lossy, so round-trip checks are tolerance-based; the
transform core is pinned against INDEPENDENT formulations (textbook DCT-II
double sum, the spec's published zigzag prefix) so a symmetric
encoder/decoder bug cannot cancel silently."""

import numpy as np
import pytest

from conflation_spark.functions.jpeg import (
    ZIGZAG,
    dct2_blocks,
    decode_jpeg,
    encode_jpeg,
    idct2_blocks,
    scaled_qtable,
    QT_LUMA,
)


def test_dct_matches_textbook_double_sum():
    """The fast matrix DCT must equal the DCT-II definition computed the
    slow way — this pins the transform independently of the codec."""
    rng = np.random.default_rng(0)
    x = rng.random((3, 8, 8)) * 255 - 128
    got = dct2_blocks(x)
    ref = np.zeros_like(got)
    for n in range(x.shape[0]):
        for u in range(8):
            for v in range(8):
                au = np.sqrt(0.5) if u == 0 else 1.0
                av = np.sqrt(0.5) if v == 0 else 1.0
                s = 0.0
                for i in range(8):
                    for j in range(8):
                        s += (
                            x[n, i, j]
                            * np.cos((2 * i + 1) * u * np.pi / 16)
                            * np.cos((2 * j + 1) * v * np.pi / 16)
                        )
                ref[n, u, v] = 0.25 * au * av * s
    assert np.abs(got - ref).max() < 1e-9
    assert np.abs(idct2_blocks(got) - x).max() < 1e-9


def test_zigzag_matches_spec_prefix():
    """First 16 entries of the scan order as published in T.81 figure 5 —
    a misdeclared table would break interop with every other decoder even
    if encode/decode agreed internally."""
    assert ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_quality_scaling_monotone_and_clamped():
    q10, q50, q90 = (scaled_qtable(QT_LUMA, q) for q in (10, 50, 90))
    assert (q10 >= q50).all() and (q50 >= q90).all()
    assert q90.min() >= 1 and q10.max() <= 255
    assert (scaled_qtable(QT_LUMA, 50) == QT_LUMA).all()
    with pytest.raises(ValueError, match="quality"):
        scaled_qtable(QT_LUMA, 0)


@pytest.mark.parametrize(
    "shape", [(8, 8), (40, 56), (33, 47, 3), (7, 9), (64, 64, 3), (72, 11)]
)
def test_roundtrip_smooth_content_tight_error(shape):
    """Gradient content (what the fixture plants): q90 round-trip error
    must stay within a few code values per pixel."""
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    base = (yy * 255 // max(shape[0] - 1, 1) + xx * 255 // max(shape[1] - 1, 1)) // 2
    if len(shape) == 3:
        arr = np.stack(
            [np.clip(base + c * 20, 0, 255) for c in range(3)], axis=2
        ).astype(np.uint8)
    else:
        arr = base.astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(arr, quality=90))
    assert dec.shape == arr.shape
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 6


@pytest.mark.parametrize("shape", [(40, 56, 3), (33, 47, 3), (9, 17, 3)])
def test_roundtrip_420_subsampled(shape):
    """4:2:0 (the dominant real-world layout): interleaved MCUs carry
    2x2 luma blocks + one chroma block each; round-trip error stays a
    few code values above 4:4:4 (chroma is 2x2-averaged), and odd dims
    exercise the padded MCU grid + crop path."""
    rng = np.random.default_rng(13)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    base = (yy * 255 // max(shape[0] - 1, 1) + xx * 255 // max(shape[1] - 1, 1)) // 2
    arr = np.stack(
        [
            np.clip(base + c * 20 + rng.integers(-20, 21, shape[:2]), 0, 255)
            for c in range(3)
        ],
        axis=2,
    ).astype(np.uint8)
    enc444 = encode_jpeg(arr, 90, subsampling="444")
    enc420 = encode_jpeg(arr, 90, subsampling="420")
    assert len(enc420) < len(enc444)  # subsampling actually engaged
    dec = decode_jpeg(enc420)
    assert dec.shape == arr.shape
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert err.mean() < 12 and err.max() < 80
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(arr, 90, subsampling="422")


def test_roundtrip_noise_content_bounded_error():
    """Pure noise is JPEG's worst case; q90 must still bound per-pixel
    error well under the feature tolerance the oracle uses."""
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(arr, quality=90))
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert err.mean() < 12 and err.max() < 80


def test_decode_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"definitely not a jpeg")
    arr = np.zeros((16, 16), dtype=np.uint8)
    data = encode_jpeg(arr)
    with pytest.raises(ValueError, match="truncated|corrupt|exhausted"):
        decode_jpeg(data[:40])


def test_decode_tolerates_fill_bytes():
    """0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2)
    and must parse identically."""
    arr = (np.arange(16 * 16).reshape(16, 16) % 256).astype(np.uint8)
    data = encode_jpeg(arr, 90)
    padded = data[:2] + b"\xff\xff" + data[2:]  # fill bytes before DQT
    assert (decode_jpeg(padded) == decode_jpeg(data)).all()


@pytest.mark.parametrize("sub", ["444", "420"])
def test_multiscan_noninterleaved_decodes_identically(sub):
    """The non-interleaved layout (one single-component SOS per
    component, the multi-scan form some baseline encoders emit) must
    decode to EXACTLY the interleaved stream's pixels — same quantized
    coefficients, different entropy layout."""
    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:33, 0:47]
    base = (yy * 255 // 32 + xx * 255 // 46) // 2
    arr = np.stack(
        [
            np.clip(base + c * 20 + rng.integers(-20, 21, (33, 47)), 0, 255)
            for c in range(3)
        ],
        axis=2,
    ).astype(np.uint8)
    inter = decode_jpeg(encode_jpeg(arr, 90, sub, interleave=True))
    multi = decode_jpeg(encode_jpeg(arr, 90, sub, interleave=False))
    assert (inter == multi).all()


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_decodes_identically_to_sequential(sub):
    """SOF2 progressive (spectral selection + successive approximation,
    the libjpeg-shaped scan script) carries the SAME quantized
    coefficients as the sequential stream, so decoded pixels must be
    bit-identical — one equality that exercises DC first/refine, AC
    banded first passes at Al=2/1, AC refinements 2->1 and 1->0, EOB
    runs and in-refinement ZRLs."""
    from conflation_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    yy, xx = np.mgrid[0:41, 0:57]
    base = (yy * 255 // 40 + xx * 255 // 56) // 2
    arr = np.stack(
        [
            np.clip(base + c * 20 + rng.integers(-25, 26, (41, 57)), 0, 255)
            for c in range(3)
        ],
        axis=2,
    ).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg(arr, 90, sub))
    prog = decode_jpeg(encode_jpeg_progressive(arr, 90, sub))
    assert (seq == prog).all()


def test_progressive_extreme_content():
    """EOB-run and refinement corner cases: flat images (maximal EOB
    runs across blocks), pure noise at high quality (dense refinement
    bits), sparse low quality (ZRL-heavy), and grayscale."""
    from conflation_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(29)
    cases = [
        (np.full((96, 80, 3), 130, np.uint8), 90, "420"),
        (rng.integers(0, 256, (40, 40, 3)).astype(np.uint8), 98, "444"),
        (rng.integers(0, 256, (56, 56, 3)).astype(np.uint8), 5, "444"),
        (np.full((80, 96), 7, np.uint8), 90, "444"),
    ]
    for arr, q, sub in cases:
        seq = decode_jpeg(encode_jpeg(arr, q, sub))
        prog = decode_jpeg(encode_jpeg_progressive(arr, q, sub))
        assert (seq == prog).all(), (arr.shape, q, sub)


def test_restart_markers_all_layouts():
    """DRI + RSTn streams (predictor and EOB-run resets at every
    boundary) must decode identically to the unrestarted stream in all
    three layouts: sequential interleaved, non-interleaved multi-scan,
    and progressive."""
    from conflation_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    yy, xx = np.mgrid[0:41, 0:57]
    base = (yy * 255 // 40 + xx * 255 // 56) // 2
    arr = np.stack(
        [
            np.clip(base + c * 20 + rng.integers(-25, 26, (41, 57)), 0, 255)
            for c in range(3)
        ],
        axis=2,
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(arr, 90, "420"))
    for ri in (1, 3):
        data = encode_jpeg(arr, 90, "420", restart_interval=ri)
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
        assert (decode_jpeg(data) == plain).all()
        assert (
            decode_jpeg(
                encode_jpeg(arr, 90, "420", interleave=False, restart_interval=ri)
            )
            == plain
        ).all()
        assert (
            decode_jpeg(encode_jpeg_progressive(arr, 90, "420", restart_interval=ri))
            == plain
        ).all()


def test_decode_rejects_short_sos_header():
    """A declared SOS length omitting the spectral-selection bytes must
    raise the documented ValueError, not IndexError (quarantine kernels
    catch ValueError only)."""
    import struct as _s

    data = encode_jpeg(np.zeros((8, 8), np.uint8), 90)
    i = data.find(b"\xff\xda")
    ns = data[i + 4]
    short_len = 2 + 1 + 2 * ns  # drops Ss/Se/AhAl
    patched = (
        data[: i + 2]
        + _s.pack(">H", short_len)
        + data[i + 4 : i + 4 + 1 + 2 * ns]
        + data[i + 4 + 1 + 2 * ns + 3 :]
    )
    with pytest.raises(ValueError, match="short SOS"):
        decode_jpeg(patched)


def test_grayscale_frame_with_sampling_factors_above_one():
    """T.81 A.2.2: EVERY single-component scan is non-interleaved — a
    grayscale frame whose SOF declares 2x2 sampling (legal; the factor
    is meaningless for one component) still carries ceil(w/8)*ceil(h/8)
    raster-ordered data units, not 16x16 MCU tiles. Built by patching
    the SOF sampling byte of a normal grayscale stream."""
    arr = (np.add.outer(np.arange(24) * 7, np.arange(24) * 5) % 256).astype(
        np.uint8
    )
    data = bytearray(encode_jpeg(arr, 90))
    i = data.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) [cid samp tq]
    samp_off = i + 4 + 6 + 1
    assert data[samp_off] == 0x11
    data[samp_off] = 0x22
    dec = decode_jpeg(bytes(data))
    assert (dec == decode_jpeg(encode_jpeg(arr, 90))).all()


def test_decode_rejects_incomplete_scan_coverage():
    """A stream whose scans do not cover every frame component must
    raise, not silently return green-shifted pixels from the zeroed
    chroma grids. Built by truncating a real multi-scan stream after
    its first (luma-only) scan."""
    yy, xx = np.mgrid[0:16, 0:16]
    arr = np.stack([(yy * 8 + c * 10) % 256 for c in (0, 1, 2)], axis=2).astype(
        np.uint8
    )
    data = encode_jpeg(arr, 90, interleave=False)
    # the second SOS starts the Cb scan; cut there and close with EOI
    second_sos = data.find(b"\xff\xda", data.find(b"\xff\xda") + 2)
    assert second_sos > 0
    with pytest.raises(ValueError, match="cover every component"):
        decode_jpeg(data[:second_sos] + b"\xff\xd9")


def test_decode_rejects_unsupported_sof_and_mislabeled_frames():
    arr = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # hierarchical/lossless: genuinely unsupported
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(data))
    # a sequential stream mislabeled SOF2 must fail loudly (its scan
    # header is invalid for progressive), never silently mis-decode
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="corrupt"):
        decode_jpeg(bytes(data))


def test_feature_tolerance_contract():
    """The contract the jpeg_features oracle gates on: q90 grid-mean
    feature of decoded pixels within JPEG_FEAT_TOL of the source-pixel
    feature, over fixture-like gradient+noise images."""
    from conflation_spark.functions.png import image_feature_grid
    from conflation_spark.operators.multimodal import JPEG_FEAT_TOL, decode_jpeg_image

    rng = np.random.default_rng(11)
    for _ in range(6):
        h, w = int(rng.integers(8, 73)), int(rng.integers(8, 73))
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2
        if rng.random() < 0.6:
            arr = np.stack(
                [
                    np.clip(base + rng.integers(-40, 41, (h, w)) + c * 30, 0, 255)
                    for c in range(3)
                ],
                axis=2,
            ).astype(np.uint8)
        else:
            arr = np.clip(base + rng.integers(-40, 41, (h, w)), 0, 255).astype(
                np.uint8
            )
        gw, gh, feat = decode_jpeg_image(encode_jpeg(arr, quality=90))
        assert (gw, gh) == (w, h)
        assert np.abs(feat - image_feature_grid(arr)).max() < JPEG_FEAT_TOL
