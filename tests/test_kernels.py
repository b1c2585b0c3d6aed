"""Shared numpy kernels: exact equality with the scalar definitions, and
batch-shape independence (the property the fixture-precomputed oracle
columns rely on)."""

import numpy as np

from conflation_spark.functions.kernels import (
    fnv1a64,
    hyperplane_signature,
    lsh_planes,
    simhash64,
)
from conflation_spark.operators.dedup import hash_token


def _simhash_scalar(t):
    toks = str(t).lower().split() if t else []
    if not toks:
        return 0
    v = [0] * 64
    for tok in toks:
        h = hash_token(tok)
        for b in range(64):
            v[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if v[b] > 0:
            out |= 1 << b
    return out if out < 2**63 else out - 2**64


def test_fnv1a64_matches_scalar():
    toks = ["spark", "a", "", "query-join", "北京", "x" * 37, "MiXeD"]
    got = fnv1a64([t.encode("utf-8") for t in toks])
    assert [int(x) for x in got] == [hash_token(t) for t in toks]


def test_simhash64_matches_scalar():
    texts = [
        "spark query table",
        "",
        None,
        "   ",
        "JOIN join Join",
        "alpha beta gamma delta " * 10,
        "x",
        "the quick brown fox jumps over the lazy dog",
    ]
    got = simhash64(texts)
    assert [int(x) for x in got] == [_simhash_scalar(t) for t in texts]


def test_simhash64_batching_invariant():
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "merge", "scan"]
    texts = [
        " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(int(rng.integers(0, 9))))
        for _ in range(200)
    ]
    full = simhash64(texts)
    parts = np.concatenate([simhash64(texts[i : i + 37]) for i in range(0, 200, 37)])
    assert (full == parts).all()


def test_hyperplane_signature_batching_invariant():
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(1000, 64))
    planes = lsh_planes(8, 64, 42)
    full = hyperplane_signature(mat, planes)
    batched = np.concatenate(
        [hyperplane_signature(mat[i : i + 137], planes) for i in range(0, 1000, 137)]
    )
    assert (full == batched).all()
    assert full.min() >= 0 and full.max() < 256  # 8-bit signatures


def test_area_resize_exact_means_and_shapes():
    from conflation_spark.functions.kernels import area_resize

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    r = area_resize(a, 4)
    assert r.shape == (4, 4)
    # box (0,0) = {0,1,8,9}: mean 4.5 rounds half-up to 5
    assert r[0, 0] == 5
    # shrink-only: small images pass through untouched (copy, not view)
    same = area_resize(a, 16)
    assert np.array_equal(same, a) and same.base is None
    # channels resize independently and identically
    rgb = np.stack([a, a, a], axis=2)
    r3 = area_resize(rgb, 4)
    assert r3.shape == (4, 4, 3) and (r3[..., 1] == r).all()
    # extreme aspect: floor keeps >= 1 pixel per axis
    assert area_resize(np.ones((7, 23), np.uint8), 5).shape == (1, 5)
    assert area_resize(np.ones((23, 7), np.uint8), 5).shape == (5, 1)
    # uneven boxes still average exactly: constant image stays constant
    c = np.full((31, 17), 113, np.uint8)
    assert (area_resize(c, 6) == 113).all()


def test_area_resize_rejects_bad_input():
    import pytest

    from conflation_spark.functions.kernels import area_resize

    with pytest.raises(ValueError, match="max_side"):
        area_resize(np.zeros((4, 4), np.uint8), 0)
    with pytest.raises(ValueError, match="uint8"):
        area_resize(np.zeros((4, 4), np.float64), 2)
    with pytest.raises(ValueError, match="uint8"):
        area_resize(np.zeros(16, np.uint8), 2)
