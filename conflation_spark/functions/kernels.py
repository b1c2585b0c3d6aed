"""Vectorized numpy kernels shared by the Spark operators (pandas_udf /
mapInPandas batches) and the fixture generator (``datagen_text``).

Sharing one code path is what makes the DuckDB oracles possible for the
non-SQL-expressible signatures: the fixture precomputes ``simhash`` /
``lsh_bucket`` columns with THESE kernels at datagen time, the Spark
queries compute them live with the SAME kernels, and the oracle SQL only
has to express the banding / Hamming / cosine logic.

Everything here is batch-vectorized — no per-row Python in the hot loop.
The FNV-1a hash is evaluated as a column sweep over a padded byte matrix
(loop length = longest token, not token count); simhash bit sums are
segment-reduced with ``np.add.reduceat``; hyperplane signatures are one
BLAS matmul per batch.
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a 64-bit over each byte string, vectorized across tokens.

    Identical to the scalar loop ``h ^= byte; h = h * prime mod 2^64``
    (``operators.dedup.hash_token``); equality is unit-tested.
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    # scatter the concatenated bytes into the padded matrix in one shot:
    # boolean-mask assignment fills row-major, exactly len(t) cells per row
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    if maxlen:
        mask = np.arange(maxlen)[None, :] < lens[:, None]
        buf[mask] = np.frombuffer(b"".join(tokens), dtype=np.uint8)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for pos in range(maxlen):
            active = lens > pos
            h[active] = (h[active] ^ buf[active, pos].astype(np.uint64)) * FNV_PRIME
    return h


def simhash64(texts) -> np.ndarray:
    """64-bit simhash per text (lowercased whitespace tokens, FNV-1a token
    hash, majority vote per bit). Returns int64 (two's-complement wrap of
    the uint64 hash — parquet/Spark LongType representation).

    Empty/None/whitespace-only texts hash to 0 (kept, like the reference
    trace filter keeps degenerate docs for downstream policy to decide).
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    tok_lists = [str(t).lower().split() if t else [] for t in texts]
    counts = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=n)
    flat = [tok.encode("utf-8") for tl in tok_lists for tok in tl]
    if not flat:
        return out
    h = fnv1a64(flat)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int8
    )
    pm = (2 * bits - 1).astype(np.int8)  # (n_tokens, 64) in {-1, +1}
    nz = counts > 0
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    # accumulate in int64 (int8 would wrap past 127 tokens per doc)
    segs = np.add.reduceat(pm, starts[nz], axis=0, dtype=np.int64)  # (n_nonempty, 64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    sims = ((segs > 0).astype(np.uint64) * weights).sum(axis=1)
    out[nz] = sims.astype(np.int64)
    return out


def lsh_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes (the LSH family's shared state)."""
    return np.random.default_rng(seed).normal(size=(n_planes, dim))


def hyperplane_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """n-bit signature per row: bit i = (row . plane_i) > 0. One matmul.

    Returns int64 (bit i in position i). Gaussian data keeps projections
    far from 0, so batch-shape-dependent BLAS summation order cannot flip
    a sign in practice; the fixture check pins this deterministically.
    """
    proj = np.asarray(mat, dtype=np.float64) @ planes.T  # (n, p)
    weights = (np.int64(1) << np.arange(planes.shape[0], dtype=np.int64)).astype(np.int64)
    return ((proj > 0).astype(np.int64) * weights).sum(axis=1)


def banded_hyperplane_signature(mat: np.ndarray, planes: np.ndarray, n_bands: int) -> np.ndarray:
    """(n, n_bands) int64 band values: the planes are split into n_bands
    groups and each group's sign bits pack into one band value. One matmul
    for all bands."""
    proj = np.asarray(mat, dtype=np.float64) @ planes.T  # (n, n_bands * bits)
    bits_per_band = planes.shape[0] // n_bands
    b3 = (proj > 0).reshape(len(proj), n_bands, bits_per_band)
    weights = np.int64(1) << np.arange(bits_per_band, dtype=np.int64)
    return (b3.astype(np.int64) * weights).sum(axis=2)


def kmeans_lloyd(x: np.ndarray, n_lists: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd k-means: init = first n_lists rows, fixed
    iteration count, empty clusters keep their previous centroid. Shared
    by the Spark IVF trainer and the DuckDB oracle generator so both see
    bit-identical centroids from the same training rows."""
    cent = np.array(x[:n_lists], dtype=np.float64, copy=True)
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for li in range(n_lists):
            members = x[assign == li]
            if len(members):
                cent[li] = members.mean(axis=0)
    return cent


def stack_vectors(col) -> np.ndarray:
    """pandas Series of list<double> (Arrow) -> (n, dim) float64 matrix."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def area_resize(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Exact integer area-mean downsample of a (h, w[, c]) uint8 image so
    its longer side becomes ``max_side`` (shrink-only; smaller images
    pass through). Output pixel (i, j) is the half-up-rounded mean of
    the source box [i*h//th, (i+1)*h//th) x [j*w//tw, (j+1)*w//tw) —
    pure integer arithmetic ((sum + area//2) // area), so the result is
    bit-deterministic across hosts and the fixture can plant exact
    resized-pixel truth. One np.add.reduceat per axis; no Python loops."""
    if max_side < 1:
        raise ValueError(f"max_side must be >= 1, got {max_side}")
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError(f"want (h, w[, c]) uint8, got {a.dtype} ndim={a.ndim}")
    h, w = a.shape[:2]
    s = max(h, w)
    if s <= max_side:
        return a.copy()
    th = max(1, (h * max_side) // s)
    tw = max(1, (w * max_side) // s)
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    sums = np.add.reduceat(a.astype(np.int64), ys[:-1], axis=0)
    sums = np.add.reduceat(sums, xs[:-1], axis=1)
    areas = np.outer(np.diff(ys), np.diff(xs))
    if a.ndim == 3:
        areas = areas[..., None]
    return ((sums + areas // 2) // areas).astype(np.uint8)
