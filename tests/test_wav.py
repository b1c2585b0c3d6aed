"""Unit tests for the pure-stdlib WAV codec (functions/wav.py) — no Spark."""

import numpy as np
import pytest

from conflation_spark.functions.wav import (
    audio_feature_segments,
    decode_wav,
    encode_wav,
    quantize_feature,
)


@pytest.mark.parametrize("shape,sr", [((100,), 8000), ((1601, 2), 16000), ((5, 1), 44100), ((9, 2), 22050)])
def test_roundtrip(shape, sr):
    rng = np.random.default_rng(hash((shape, sr)) % 2**32)
    s = rng.integers(-32768, 32768, shape).astype(np.int16)
    back, sr2 = decode_wav(encode_wav(s, sr))
    want = s[:, None] if s.ndim == 1 else s
    assert sr2 == sr
    assert back.shape == want.shape and (back == want).all()


def test_feature_deterministic_through_codec():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, (700, 2)).astype(np.int16)
    f1 = quantize_feature(audio_feature_segments(s))
    f2 = quantize_feature(audio_feature_segments(decode_wav(encode_wav(s, 16000))[0]))
    assert (f1 == f2).all() and f1.shape == (16,)


def test_decode_rejects_garbage_truncation_and_formats():
    import struct

    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"not a wav at all!!")
    good = encode_wav(np.zeros(50, np.int16))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-6])
    # patch fmt to 8-bit -> unsupported (fmt chunk body starts at 20;
    # bits-per-sample is its last ushort at offset 20+14)
    bad = bytearray(good)
    bad[34:36] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad))


def test_encode_rejects_empty():
    with pytest.raises(ValueError):
        encode_wav(np.zeros((0,), np.int16))


def test_multiple_data_chunks_first_wins():
    """A second data chunk (naive concatenation) must not silently
    replace the first — first-chunk-wins like real readers."""
    import struct

    s1 = np.arange(10, dtype=np.int16)
    s2 = np.arange(100, 120, dtype=np.int16)
    one = encode_wav(s1, 8000)
    extra = b"data" + struct.pack("<I", s2.nbytes) + s2.tobytes()
    riff_len = len(one) - 8 + len(extra)
    doubled = b"RIFF" + struct.pack("<I", riff_len) + one[8:] + extra
    back, sr = decode_wav(doubled)
    assert sr == 8000 and (back[:, 0] == s1).all()
