"""Unit tests for the pure-stdlib GIF codec (functions/gif.py) — no Spark."""

import numpy as np
import pytest

from conflation_spark.functions.gif import decode_gif, encode_gif
from conflation_spark.functions.png import image_feature_grid, quantize_feature


def _pal(rng, n):
    return rng.integers(0, 256, (n, 3)).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (9, 1), (5, 5), (37, 53), (64, 64)])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_exact(shape, interlace):
    rng = np.random.default_rng(abs(hash((shape, interlace))) % 2**32)
    n_pal = int(rng.integers(2, 257))
    pal = _pal(rng, n_pal)
    idx = rng.integers(0, n_pal, shape).astype(np.uint8)
    back = decode_gif(encode_gif(pal, idx, interlace=interlace))
    assert back.shape == (*shape, 3)
    assert (back == pal[idx]).all()


def test_local_color_table_and_extensions():
    rng = np.random.default_rng(5)
    pal = _pal(rng, 200)
    idx = rng.integers(0, 200, (23, 31)).astype(np.uint8)
    for local in (False, True):
        for ext in (False, True):
            blob = encode_gif(pal, idx, local_table=local, extensions=ext)
            assert (decode_gif(blob) == pal[idx]).all()


def test_table_overflow_clear_reset():
    """>4096 distinct LZW strings forces the encoder's CLEAR-reset and the
    decoder's table rebuild mid-image."""
    rng = np.random.default_rng(17)
    pal = _pal(rng, 256)
    idx = rng.integers(0, 256, (300, 300)).astype(np.uint8)
    assert (decode_gif(encode_gif(pal, idx)) == pal[idx]).all()


def test_kwkwk_runs():
    """Long constant runs hit the KwKwK code-equals-next_code case."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.zeros((40, 40), np.uint8)
    idx[::5, :] = 1
    assert (decode_gif(encode_gif(pal, idx)) == pal[idx]).all()


def test_tiny_palette_min_code_size_floor():
    """2-entry palettes still use min LZW code size 2 (per spec)."""
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = (np.arange(63 * 9).reshape(63, 9) % 2).astype(np.uint8)
    blob = encode_gif(pal, idx)
    assert (decode_gif(blob) == pal[idx]).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:4] + b"XX" + b[6:],           # bad version
        lambda b: b[:20],                          # truncated
        lambda b: b.replace(b"GIF89a", b"PNG89a"), # bad magic
    ],
)
def test_malformed_raises(mutate):
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    blob = encode_gif(pal, np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        decode_gif(mutate(blob))


def test_interlace_is_really_interlaced():
    """An interlaced blob decoded WITHOUT deinterlacing would scramble
    rows — prove the flag changes the wire layout, not just a header."""
    pal = np.stack([np.arange(64)] * 3, 1).astype(np.uint8) * 4
    idx = (np.arange(16)[:, None] * np.ones(8, int)[None, :] % 64).astype(np.uint8)
    a = encode_gif(pal, idx, interlace=False)
    b = encode_gif(pal, idx, interlace=True)
    assert a != b
    assert (decode_gif(a) == decode_gif(b)).all()


def test_feature_grid_through_codec():
    rng = np.random.default_rng(7)
    pal = _pal(rng, 64)
    idx = rng.integers(0, 64, (37, 53)).astype(np.uint8)
    f_src = quantize_feature(image_feature_grid(pal[idx]))
    f_dec = quantize_feature(image_feature_grid(decode_gif(encode_gif(pal, idx))))
    assert (f_src == f_dec).all()


def test_gif_fixture_truth(tmp_path):
    """Fixture blobs decode to exactly the planted feature truth."""
    import pyarrow.parquet as pq

    from conflation_spark.datagen_text import gen_gif_blobs
    from conflation_spark.operators.multimodal import decode_gif_image

    gen_gif_blobs(str(tmp_path), 40)
    t = pq.read_table(str(tmp_path / "gif_blobs.parquet")).to_pydict()
    for i in range(40):
        w, h, feat = decode_gif_image(t["content"][i])
        assert (w, h) == (t["true_width"][i], t["true_height"][i])
        q = quantize_feature(feat)
        truth = np.array([t[f"f{j}"][i] for j in range(16)])
        assert (q == truth).all()
