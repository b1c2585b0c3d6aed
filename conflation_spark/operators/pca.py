"""Distributed PCA over embedding columns (array<float>): the dimension
-reduction stage a training-data pipeline runs before ANN / clustering /
visualization when raw embeddings are wider than the retrieval task needs.

Scale design (the part that matters at 100 TB):

- ``embedding_moments`` never shuffles vectors and never collects the
  corpus. Each input PARTITION is reduced to a single partial-moment row
  (count, per-dim sums, flattened d x d Gram matrix) inside one
  ``mapInPandas`` pass — one BLAS ``X.T @ X`` per Arrow batch, accumulated
  across the partition's batches via the iterator (CLAUDE.md rule 4: no
  per-group Arrow round-trips; there are no groups at all). The partials
  (one row per partition, d^2+d+1 doubles each) are then summed by a
  plain ``posexplode`` + ``groupBy(idx).sum`` — map-side partial
  aggregation combines them tree-style, so a million-partition corpus
  reduces through the shuffle, not through the driver.
- The only driver-side object is the d x d covariance itself (``pca_fit``
  collects d^2+d+1 aggregate rows). That is bounded by the CONTRACT
  ``dim <= MAX_PCA_DIM`` (enforced fail-fast, like similarity's
  MAX_QUERY_SET) — it is a model, not data.
- ``pca_project`` closure-broadcasts the (k, d) component matrix and maps
  the corpus once with a single matmul per Arrow batch; no join, no
  shuffle, no interpreted per-element lambdas (CLAUDE.md rule 3).

Covariance is the POPULATION covariance Gram/n - mean mean^T, computed in
float64 from the float32 inputs so the DuckDB oracle (sequential SUM over
unnested arrays) agrees to ~1e-13 relative — integerized at 1e6 by the
gated query. Eigenvectors get a deterministic sign convention (the
largest-|entry| coordinate is made positive) so fits are reproducible
across hosts and sessions.

Reference scope note: the reference pipeline has no PCA (its embedding
work ends at Valhalla map-matching); this operator is part of the
LLM-training-data suite the brief adds on top, feeding the ANN family in
`operators/similarity.py`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conflation_spark.functions.kernels import stack_vectors

# hard cap on the model size pca_fit collects: d^2+d+1 aggregate rows
# (1024 -> ~8.4 MB of doubles). Enforced, not assumed.
MAX_PCA_DIM = 1024

_MOMENTS_SCHEMA = "n double, sums array<double>, gram array<double>"


def embedding_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One row per aggregate index: ``idx`` in [0, d^2) are the flattened
    row-major Gram entries sum(x_i * x_j); [d^2, d^2+d) are the per-dim
    sums; idx == d^2+d is the row count. Everything downstream (covariance
    query, fit) derives from this single corpus scan."""
    if dim < 1 or dim > MAX_PCA_DIM:
        raise ValueError(f"dim must be in [1, {MAX_PCA_DIM}], got {dim}")

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0.0
        sums = np.zeros(dim, dtype=np.float64)
        gram = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = stack_vectors(pdf[vec_col])
            if x.shape[1] != dim:
                raise ValueError(
                    f"embedding dim mismatch: expected {dim}, got {x.shape[1]}"
                )
            n += float(len(x))
            sums += x.sum(axis=0)
            gram += x.T @ x
        yield pd.DataFrame(
            {"n": [n], "sums": [sums.tolist()], "gram": [gram.reshape(-1).tolist()]}
        )

    partials = df.select(vec_col).mapInPandas(_partial, schema=_MOMENTS_SCHEMA)
    ex = partials.select(
        F.posexplode(
            F.concat("gram", "sums", F.array(F.col("n")))
        ).alias("idx", "val")
    )
    # map-side partial aggregation tree-reduces the per-partition partials;
    # the result is exactly d^2+d+1 rows regardless of corpus size
    return ex.groupBy("idx").agg(F.sum("val").alias("val"))


def covariance_entries(
    df: DataFrame, vec_col: str, dim: int, scale: int = 1_000_000
) -> DataFrame:
    """Population covariance matrix as (i, j, cov_c) rows, integerized at
    ``scale`` — the DuckDB-gated surface. Derived fully in-plan from the
    moment rows: the d^2-row Gram slice joins the broadcast d-row mean
    slice twice plus the 1-row count; all join inputs are model-sized."""
    return moments_to_covariance(embedding_moments(df, vec_col, dim), dim, scale)


def moments_to_covariance(mom: DataFrame, dim: int, scale: int = 1_000_000) -> DataFrame:
    """(idx, val) moment rows -> integerized (i, j, cov_c) covariance —
    shared by the one-shot path and the incremental checkpointed path
    (moments are plain sums, so folded moments flow through unchanged)."""
    d2 = dim * dim
    g = mom.where(F.col("idx") < d2).select(
        (F.col("idx") / dim).cast("int").alias("i"),
        F.pmod(F.col("idx"), F.lit(dim)).cast("int").alias("j"),
        F.col("val").alias("s_ij"),
    )
    m = mom.where((F.col("idx") >= d2) & (F.col("idx") < d2 + dim)).select(
        (F.col("idx") - d2).cast("int").alias("mi"),
        F.col("val").alias("s_m"),
    )
    n = mom.where(F.col("idx") == d2 + dim).select(F.col("val").alias("n_rows"))
    cov = (
        g.crossJoin(F.broadcast(n))
        .join(F.broadcast(m).withColumnsRenamed({"mi": "i", "s_m": "s_i"}), "i")
        .join(F.broadcast(m).withColumnsRenamed({"mi": "j", "s_m": "s_j"}), "j")
        .select(
            "i",
            "j",
            (
                F.col("s_ij") / F.col("n_rows")
                - (F.col("s_i") / F.col("n_rows")) * (F.col("s_j") / F.col("n_rows"))
            ).alias("cov"),
        )
    )
    return cov.select(
        "i",
        "j",
        F.round(F.col("cov") * scale).cast("long").alias("cov_c"),
    )


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, descending variance
    explained_variance: np.ndarray  # (k,) eigenvalues

    @property
    def k(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int) -> PCAModel:
    """Fit from one corpus scan: collect the d^2+d+1 moment aggregates
    (model-sized, contract-bounded), assemble the covariance on the
    driver, ``eigh`` it (symmetric, deterministic), keep the top-k
    eigenvectors with the sign convention that each component's
    largest-|entry| coordinate is positive."""
    if k < 1 or k > dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    return fit_from_moments(embedding_moments(df, vec_col, dim), dim, k)


def fit_from_moments(mom: DataFrame, dim: int, k: int) -> PCAModel:
    """Fit from an (idx, val) moment DataFrame — the one-shot and
    incremental paths share this driver-side assembly."""
    if k < 1 or k > dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    rows = mom.collect()
    d2 = dim * dim
    flat = np.zeros(d2 + dim + 1, dtype=np.float64)
    for r in rows:
        flat[r["idx"]] = r["val"]
    n = flat[d2 + dim]
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {int(n)}")
    mean = flat[d2 : d2 + dim] / n
    cov = flat[:d2].reshape(dim, dim) / n - np.outer(mean, mean)
    # symmetrize against float accumulation asymmetry before eigh
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()  # (k, d)
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=evals[order].copy(),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    id_col: str,
    vec_col: str,
    out_col: str = "pca",
) -> DataFrame:
    """Project the corpus onto the fitted components: (id, array<double>[k])
    via one closure-broadcast matmul per Arrow batch. Output order and
    values are deterministic given the model; downstream ANN operators
    consume ``out_col`` exactly like a raw embedding column."""
    mean = model.mean
    comp_t = model.components.T  # (d, k)

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = stack_vectors(pdf[vec_col])
            z = (x - mean) @ comp_t
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(z)})

    schema = f"{id_col} string, {out_col} array<double>"
    return df.select(F.col(id_col).cast("string"), vec_col).mapInPandas(
        _proj, schema=schema
    )
