"""FLAC codec tests: lossless round trips across every decode path,
HAND-ASSEMBLED spec byte vectors (frame layout + CRCs derived manually
from RFC 9639, independent of the encoder — the same
anti-symmetric-bug defense the GIF tests use), corruption/validation
behavior, and the Spark-side planted-truth gate."""

import math
import struct

import numpy as np
import pytest

from conflation_spark.functions.flac import decode_flac, encode_flac

FRAMES_OFFSET = 4 + 4 + 34  # magic + metadata header + STREAMINFO


def _ref_crc(data: bytes, width: int, poly: int) -> int:
    """Textbook bit-serial LFSR CRC (MSB-first, init 0) — deliberately a
    different formulation than the codec's table-driven one."""
    reg = 0
    mask = (1 << width) - 1
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            feed = bit ^ ((reg >> (width - 1)) & 1)
            reg = (reg << 1) & mask
            if feed:
                reg ^= poly & mask
    return reg


def _rt(s, sr=16000, **kw):
    src = np.asarray(s)
    if src.ndim == 1:
        src = src[:, None]
    blob = encode_flac(s, sr, **kw)
    dec, sr2 = decode_flac(blob)
    assert sr2 == sr
    assert dec.shape == src.shape
    assert np.array_equal(dec, src), kw
    return blob


def _signal(n=1000, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    s = 3000 * np.sin(t / 30)[:, None] + rng.normal(0, 50, (n, ch))
    s = np.clip(s, -32768, 32767).astype(np.int16)
    return s[:, 0] if ch == 1 else s


# ------------------------------------------------- hand-derived vectors

def test_constant_frame_bytes_match_spec_derivation():
    """4 constant samples: every field of the frame hand-assembled from
    the spec — sync, explicit 8-bit block size (code 0110), sample-rate
    code 0101 (16 kHz), mono, bps code 100, UTF-8 frame number 0,
    CRC-8, constant subframe, CRC-16."""
    blob = encode_flac(np.array([3, 3, 3, 3], np.int16), 16000)
    hdr = bytes([0xFF, 0xF8, 0x65, 0x08, 0x00, 0x03])
    hdr += bytes([_ref_crc(hdr, 8, 0x07)])
    body = hdr + bytes([0x00, 0x00, 0x03])  # subframe hdr + constant 16-bit 3
    frame = body + struct.pack(">H", _ref_crc(body, 16, 0x8005))
    assert blob[FRAMES_OFFSET:] == frame
    dec, _ = decode_flac(blob)
    assert dec[:, 0].tolist() == [3, 3, 3, 3]


def test_verbatim_frame_bytes_match_spec_derivation():
    blob = encode_flac(np.array([1, -2], np.int16), 16000, force_type="verbatim")
    hdr = bytes([0xFF, 0xF8, 0x65, 0x08, 0x00, 0x01])
    hdr += bytes([_ref_crc(hdr, 8, 0x07)])
    body = hdr + bytes([0x02, 0x00, 0x01, 0xFF, 0xFE])
    frame = body + struct.pack(">H", _ref_crc(body, 16, 0x8005))
    assert blob[FRAMES_OFFSET:] == frame


def test_rice_frame_bytes_match_spec_derivation():
    """[0,1,0,1] picks fixed order 0, rice k=0: zigzag (0,2,0,2) codes
    '1','001','1','001' — subframe bits hand-packed to 10 00 26 40."""
    blob = encode_flac(np.array([0, 1, 0, 1], np.int16), 16000)
    hdr = bytes([0xFF, 0xF8, 0x65, 0x08, 0x00, 0x03])
    hdr += bytes([_ref_crc(hdr, 8, 0x07)])
    body = hdr + bytes([0x10, 0x00, 0x26, 0x40])
    frame = body + struct.pack(">H", _ref_crc(body, 16, 0x8005))
    assert blob[FRAMES_OFFSET:] == frame
    dec, _ = decode_flac(blob)
    assert dec[:, 0].tolist() == [0, 1, 0, 1]


def test_streaminfo_layout():
    blob = encode_flac(_signal(700), 22050, block_size=256)
    assert blob[:4] == b"fLaC"
    assert blob[4] == 0x80  # last metadata block, type STREAMINFO
    assert blob[5:8] == struct.pack(">I", 34)[1:]
    # 20-bit sample rate starts at STREAMINFO byte 10
    si = blob[8 : 8 + 34]
    assert int.from_bytes(si[10:13], "big") >> 4 == 22050
    # 36-bit total samples: low 4 bits of byte 13 + bytes 14-17
    assert ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big") == 700


# ------------------------------------------------------- round trips

def test_roundtrip_mono_fixed():
    _rt(_signal())


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_roundtrip_stereo_modes(mode):
    _rt(_signal(ch=2, seed=3), stereo_mode=mode)


@pytest.mark.parametrize("order", [1, 2, 4, 8, 12])
def test_roundtrip_lpc_orders(order):
    _rt(_signal(seed=order), lpc_order=order)


def test_roundtrip_rice2_escape_partitions():
    _rt(_signal(seed=5), rice2=True, partition_order=2)
    _rt(_signal(seed=6), force_escape=True, partition_order=1)
    _rt(_signal(seed=7), rice2=True, force_escape=True)


def test_roundtrip_wasted_bits():
    s = ((_signal(seed=8).astype(np.int32) >> 3) << 3).astype(np.int16)
    blob = _rt(s)
    # wasted-bits flag of the first subframe must actually be set
    sub = blob[FRAMES_OFFSET + 7]
    assert sub & 0x01, "wasted-bits flag not exercised"


def test_roundtrip_partial_last_frame_and_blocksizes():
    for bs in (192, 250, 256, 576, 1024):
        _rt(_signal(990, seed=bs), block_size=bs)


def test_roundtrip_off_table_sample_rate():
    blob = _rt(_signal(400, seed=9), sr=12000)
    # sample-rate code 1101 (16-bit Hz at end of header)
    assert blob[FRAMES_OFFSET + 2] & 0x0F == 0b1101


def test_roundtrip_extremes_and_sweep():
    rng = np.random.default_rng(42)
    _rt(np.array([32767, -32768, 32767, -32768, 0], np.int16))
    _rt(np.zeros(300, np.int16))
    for trial in range(15):
        n = int(rng.integers(5, 900))
        ch = int(rng.integers(1, 3))
        s = rng.integers(-2000, 2000, (n, ch)).astype(np.int16)
        _rt(
            s if ch == 2 else s[:, 0],
            sr=int(rng.choice([8000, 16000, 12000])),
            block_size=int(rng.choice([192, 250, 256])),
            lpc_order=int(rng.choice([0, 2, 6])),
            rice2=bool(rng.integers(0, 2)),
            partition_order=int(rng.integers(0, 3)),
            force_escape=bool(rng.random() < 0.3),
        )


# ------------------------------------------------------- validation

def test_corruption_detected():
    blob = bytearray(encode_flac(_signal(500, seed=11), 16000))
    with pytest.raises(ValueError, match="bad magic"):
        decode_flac(b"fLaX" + bytes(blob[4:]))
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(bytes(blob[:60]))
    # flip a residual bit mid-frame -> CRC-16 (or an earlier check) trips
    bad = bytearray(blob)
    bad[-10] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # tamper the STREAMINFO MD5 only -> the PCM self-check trips
    bad2 = bytearray(blob)
    bad2[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad2))


# ------------------------------------------------------- spark gate

def test_fixture_decode_matches_planted_truth(spark):
    from conflation_spark.datagen_text import SF_FLAC, ensure_flac_fixture
    from conflation_spark.operators.multimodal import (
        decode_flac_audio,
        extract_audio_features,
    )

    d = ensure_flac_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/flac_blobs.parquet")
    feats = extract_audio_features(blobs, decoder=decode_flac_audio)
    rows = feats.join(blobs.drop("content"), "media_ref").collect()
    assert len(rows) == SF_FLAC["sf0.001"]
    for r in rows:
        assert r["sample_rate"] == r["true_sample_rate"]
        assert r["n_samples"] == r["true_n_samples"]
        assert r["n_channels"] == r["true_n_channels"]
        for i in range(16):
            assert math.floor(r["feature"][i] * 1e6 + 0.5) == r[f"a{i}"], (
                r["media_ref"],
                i,
            )


# ------------------------------------------------------- spectrum

def test_spectral_band_energies_localize_tones():
    from conflation_spark.functions.wav import spectral_band_energies

    sr = 16000
    t = np.arange(4096) / sr
    for band, frac in ((1, 0.125), (4, 0.5 * 9 / 16), (6, 0.5 * 13 / 16)):
        tone = (10000 * np.sin(2 * np.pi * (sr * frac) * t)).astype(np.int16)
        e = spectral_band_energies(tone)
        assert int(np.argmax(e)) == band, (band, e)
        assert abs(float(e.sum()) - 1.0) < 1e-12


def test_fixture_spectrum_matches_planted_truth(spark):
    from conflation_spark.datagen_text import SF_FLAC, ensure_flac_fixture
    from conflation_spark.operators.multimodal import extract_audio_spectrum

    d = ensure_flac_fixture("sf0.001")
    blobs = spark.read.parquet(f"{d}/flac_blobs.parquet")
    rows = (
        extract_audio_spectrum(blobs)
        .join(blobs.drop("content"), "media_ref")
        .collect()
    )
    assert len(rows) == SF_FLAC["sf0.001"]
    for r in rows:
        assert r["sample_rate"] == r["true_sample_rate"]
        assert r["n_fft_frames"] == r["true_n_fft_frames"]
        for i in range(8):
            assert math.floor(r["feature"][i] * 1e6 + 0.5) == r[f"s{i}"], (
                r["media_ref"],
                i,
            )


def test_unknown_total_samples_decodes_to_eof():
    """STREAMINFO total_samples == 0 means UNKNOWN (RFC 9639): the
    decoder must consume frames to EOF and return everything."""
    s = _signal(700, seed=33)
    blob = bytearray(encode_flac(s, 16000, block_size=256))
    si = 8  # STREAMINFO body offset
    blob[si + 13] &= 0xF0  # zero the 36-bit total-samples field
    for k in range(14, 18):
        blob[si + k] = 0
    dec, sr = decode_flac(bytes(blob))
    assert sr == 16000
    assert np.array_equal(dec[:, 0], s)


def test_unusual_bps_writes_unset_md5():
    """Widths numpy cannot pack natively must carry the spec's all-zero
    (unset) MD5 rather than a wrong digest."""
    s = np.array([1000, -1000, 0, 70000, -70000], dtype=np.int64)
    blob = encode_flac(s, 16000, bps=24)
    assert blob[8 + 18 : 8 + 34] == b"\x00" * 16
    dec, _ = decode_flac(blob)
    assert dec[:, 0].tolist() == s.tolist()
