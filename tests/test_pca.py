"""Distributed PCA: covariance parity with numpy, partition invariance
(the distributed sum must not depend on how the corpus is split), fit
parity with a driver-side eigh, projection exactness, and the rotation
property (full-rank PCA preserves pairwise geometry)."""

import numpy as np
import pytest

from conflation_spark.operators.pca import (
    MAX_PCA_DIM,
    covariance_entries,
    pca_fit,
    pca_project,
)

DIM = 12
N = 300


def _corpus(seed=7, n=N, dim=DIM):
    rng = np.random.default_rng(seed)
    # anisotropic so the spectrum is well-separated (no eigh order ties)
    scales = np.linspace(3.0, 0.2, dim)
    x = (rng.standard_normal((n, dim)) * scales).astype(np.float32)
    return x


def _df(spark, x, parts=4):
    rows = [(f"v{i:04d}", [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id string, embedding array<float>").repartition(
        parts
    )


def _np_cov(x):
    x64 = x.astype(np.float64)
    mean = x64.mean(axis=0)
    return (x64.T @ x64) / len(x64) - np.outer(mean, mean)


def test_covariance_matches_numpy(spark):
    x = _corpus()
    got = {
        (r["i"], r["j"]): r["cov_c"]
        for r in covariance_entries(_df(spark, x), "embedding", DIM).collect()
    }
    want = np.round(_np_cov(x) * 1_000_000).astype(np.int64)
    assert len(got) == DIM * DIM
    for (i, j), v in got.items():
        assert v == want[i, j], (i, j)


def test_covariance_partition_invariant(spark):
    x = _corpus(seed=11)
    a = covariance_entries(_df(spark, x, parts=1), "embedding", DIM).collect()
    b = covariance_entries(_df(spark, x, parts=13), "embedding", DIM).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fit_matches_driver_eigh(spark):
    x = _corpus(seed=3)
    model = pca_fit(_df(spark, x), "embedding", DIM, k=5)
    cov = _np_cov(x)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2)
    order = np.argsort(evals)[::-1][:5]
    want = evecs[:, order].T.copy()
    for c in want:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    assert np.allclose(model.explained_variance, evals[order], rtol=1e-10)
    assert np.allclose(model.components, want, atol=1e-10)
    # descending variance, deterministic sign
    assert list(model.explained_variance) == sorted(model.explained_variance, reverse=True)
    for c in model.components:
        assert c[np.argmax(np.abs(c))] > 0


def test_project_matches_numpy_and_orders_variance(spark):
    x = _corpus(seed=19)
    df = _df(spark, x)
    model = pca_fit(df, "embedding", DIM, k=4)
    out = pca_project(df, model, "vec_id", "embedding").collect()
    z = np.array(
        [r["pca"] for r in sorted(out, key=lambda r: r["vec_id"])], dtype=np.float64
    )
    want = (x.astype(np.float64) - model.mean) @ model.components.T
    assert z.shape == (N, 4)
    assert np.allclose(z, want, atol=1e-9)
    # empirical variance along components is the eigenvalue, descending
    var = z.var(axis=0)
    assert np.allclose(var, model.explained_variance, rtol=1e-8)
    assert list(var) == sorted(var, reverse=True)


def test_full_rank_projection_is_isometric(spark):
    """k == dim PCA is a rotation (+ centering): pairwise distances are
    preserved, which is the invariant that makes PCA-then-ANN sound."""
    x = _corpus(seed=23, n=60)
    df = _df(spark, x)
    model = pca_fit(df, "embedding", DIM, k=DIM)
    out = {r["vec_id"]: np.array(r["pca"]) for r in pca_project(df, model, "vec_id", "embedding").collect()}
    ids = sorted(out)
    z = np.array([out[i] for i in ids])
    x64 = x.astype(np.float64)

    def pdist(m):
        return np.sqrt(((m[:, None, :] - m[None, :, :]) ** 2).sum(-1))

    assert np.allclose(pdist(z), pdist(x64), atol=1e-8)


def test_guards(spark):
    x = _corpus(seed=5, n=10)
    df = _df(spark, x)
    with pytest.raises(ValueError, match="dim must be"):
        covariance_entries(df, "embedding", MAX_PCA_DIM + 1).collect()
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "embedding", DIM, k=DIM + 1)
    with pytest.raises(Exception, match="dim mismatch"):
        covariance_entries(df, "embedding", DIM - 1).collect()


# -------------------------------------------------- incremental moments

def test_incremental_fold_equals_full_recompute(spark):
    """checkpoint(corpus) + fold(delta) must equal the one-shot moments
    over corpus|delta — exactly under the gated integerization, and to
    float-reassociation tolerance on the raw covariance."""
    from conflation_spark.operators.incremental import (
        checkpoint_pca_moments,
        incremental_pca_covariance,
        incremental_pca_fit,
        incremental_pca_update,
    )

    x = _corpus(seed=31, n=240)
    full = _df(spark, x)
    corpus = _df(spark, x[:170], parts=3)
    delta = _df(spark, x[170:], parts=2)
    checkpoint_pca_moments(corpus, "t_pca_mom", "embedding", DIM)
    incremental_pca_update(spark, "t_pca_mom", delta, "embedding", DIM)

    inc = {
        (r["i"], r["j"]): r["cov_c"]
        for r in incremental_pca_covariance(spark, "t_pca_mom", DIM).collect()
    }
    one = {
        (r["i"], r["j"]): r["cov_c"]
        for r in covariance_entries(full, "embedding", DIM).collect()
    }
    assert inc == one

    m_inc = incremental_pca_fit(spark, "t_pca_mom", DIM, k=4)
    m_one = pca_fit(full, "embedding", DIM, k=4)
    assert np.allclose(m_inc.components, m_one.components, atol=1e-8)
    assert np.allclose(m_inc.explained_variance, m_one.explained_variance, rtol=1e-8)


def test_incremental_fold_is_associative(spark):
    """Two successive delta folds equal one combined fold (sums)."""
    from conflation_spark.operators.incremental import (
        checkpoint_pca_moments,
        incremental_pca_covariance,
        incremental_pca_update,
    )

    x = _corpus(seed=37, n=180)
    checkpoint_pca_moments(_df(spark, x[:100]), "t_pca_mom2", "embedding", DIM)
    incremental_pca_update(spark, "t_pca_mom2", _df(spark, x[100:140]), "embedding", DIM)
    incremental_pca_update(spark, "t_pca_mom2", _df(spark, x[140:]), "embedding", DIM)
    two = {
        (r["i"], r["j"]): r["cov_c"]
        for r in incremental_pca_covariance(spark, "t_pca_mom2", DIM).collect()
    }
    checkpoint_pca_moments(_df(spark, x[:100]), "t_pca_mom3", "embedding", DIM)
    incremental_pca_update(spark, "t_pca_mom3", _df(spark, x[100:]), "embedding", DIM)
    one = {
        (r["i"], r["j"]): r["cov_c"]
        for r in incremental_pca_covariance(spark, "t_pca_mom3", DIM).collect()
    }
    assert two == one
