"""Unit tests for the pure-stdlib Y4M codec (functions/y4m.py) — no Spark."""

import numpy as np
import pytest

from conflation_spark.functions.y4m import (
    decode_y4m,
    encode_y4m,
    frame_luma_mean,
    quantize,
)


@pytest.mark.parametrize("n,h,w", [(1, 2, 2), (5, 16, 24), (9, 32, 32), (6, 60, 18)])
def test_roundtrip(n, h, w):
    rng = np.random.default_rng(n * 1000 + h + w)
    f = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    back, w2, h2 = decode_y4m(encode_y4m(f))
    assert (w2, h2) == (w, h)
    assert back.shape == f.shape and (back == f).all()
    for t in range(n):
        assert quantize(frame_luma_mean(f[t])) == quantize(frame_luma_mean(back[t]))


def test_decode_rejects_garbage_and_corruption():
    with pytest.raises(ValueError, match="signature"):
        decode_y4m(b"MPEG nope")
    f = np.zeros((3, 4, 4), dtype=np.uint8)
    good = encode_y4m(f)
    with pytest.raises(ValueError, match="short frame|no frames|truncated"):
        decode_y4m(good[:-5])
    # break a FRAME marker
    bad = bytearray(good)
    i = good.find(b"FRAME")
    bad[i] = ord(b"X")
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(bytes(bad))
    # unsupported colorspace
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(good.replace(b"C420jpeg", b"C444same", 1))


def test_encode_rejects_odd_dims_and_empty():
    with pytest.raises(ValueError, match="even"):
        encode_y4m(np.zeros((1, 3, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_y4m(np.zeros((0, 4, 4), dtype=np.uint8))


def test_decode_rejects_high_bit_depth_c420():
    """C420p10 and friends use 2 bytes/sample — the 8-bit frame math
    would misread them, so they must be rejected as unsupported, not
    half-decoded into a confusing FRAME-marker error."""
    f = np.zeros((2, 4, 4), dtype=np.uint8)
    data = encode_y4m(f).replace(b"C420jpeg", b"C420p10 ", 1)
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(data)
