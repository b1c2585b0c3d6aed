"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. The bounded QUERY set (a
  probe set by definition — never the corpus) is collected and
  closure-broadcast as a normalized matrix; the corpus is scanned once by
  ``mapInPandas`` where each Arrow batch does a single BLAS matmul and
  emits its batch-local top-k per query. A final window reduces the
  Q x k x n_batches survivors to Q x k. O(Q x N) compute, fully
  distributed, no corpus collection, no interpreted per-pair lambdas
  (CLAUDE.md rule 3: HOF lambdas on join paths are 10-100x traps).
- multi-table hyperplane-LSH ANN: the scale path. n_tables independent
  h-bit signatures via ONE banded numpy matmul per batch
  (``functions.kernels.banded_hyperplane_signature`` — shared with datagen
  so the DuckDB oracle can read the fixture's precomputed ``lsh_buckets``
  column); probe each table at the query's bucket plus all Hamming-1
  neighbors. The candidate join is an equi-join on (table, bucket), so at
  10^12 vectors the fan-out is bucket-local; candidate cosines are
  vectorized per batch.
- IVF ANN: nearest-centroid inverted lists (deterministic shared-kernel
  k-means on a bounded sample, distributed assignment); queries probe
  n_probe lists. The incremental/bucketed variant lives in
  `operators/incremental.py`.
- product-quantization ANN (``pq_topk``): the MEMORY axis — the corpus
  is encoded once into m_sub codebook codes (~8-16 B/vector vs 512 B
  raw), search scans only the codes column with an integer ADC
  lookup-table gather-sum, and an optional exact-cosine re-rank of the
  shortlist resolves within-cell ties the way deployments do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conflation_spark.operators.spread import local_df

from conflation_spark.functions.kernels import (
    hyperplane_signature,
    lsh_planes,
    stack_vectors,
)

# the multi-table LSH family used for the `lsh_buckets` fixture column
# (datagen_text): ANN_N_TABLES independent tables of ANN_N_PLANES bits each,
# drawn as one (tables x bits) plane matrix and banded — one table per band.
# Sizing: per-table bits ~ log2(N / target_bucket_size); tables multiply
# recall (miss = (1 - p_hit)^tables). 8 x 10 bits measures recall@10 = 0.97
# at ~11% candidate fraction on the clustered bench corpus.
ANN_N_TABLES = 8
ANN_N_PLANES = 10
ANN_DIM = 64
ANN_SEED = 42

TOPK_SCHEMA = "query_id string, neighbor_id string, cosine_c long"


def _topk_window(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_c").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine_c")
    )


MAX_QUERY_SET = 10_000  # hard cap on the collected probe set (enforced, not assumed)


def _collect_query_matrix(
    queries: DataFrame, query_id_col: str, vec_col: str, max_queries: int = MAX_QUERY_SET
):
    """Bounded probe set -> (sorted ids, matrix, norms). The query set is
    small by contract (it is the user's probe list); the CORPUS is never
    collected. The contract is ENFORCED: a probe set larger than
    ``max_queries`` fails fast (cheap ``limit(n+1)`` count — a LocalLimit
    short-circuits the scan) instead of silently OOM-ing the driver."""
    probe = queries.select(F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv"))
    if probe.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"query probe set exceeds {max_queries} rows — brute_force_topk "
            "collects the query side; pass a bounded probe set (or raise "
            "max_queries explicitly)"
        )
    rows = probe.collect()
    if not rows:
        # keep the matrix 2-D so callers can shape-check / short-circuit
        # instead of tripping on a 1-D shape-(0,) array
        return np.empty(0, dtype="U1"), np.empty((0, 0)), np.empty(0)
    qids = np.array([r["qid"] for r in rows], dtype="U")
    order = np.argsort(qids, kind="stable")
    qids = qids[order]
    qmat = np.array([rows[int(i)]["qv"] for i in order], dtype=np.float64)
    qnrm = np.linalg.norm(qmat, axis=1)
    return qids, qmat, qnrm


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = MAX_QUERY_SET,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, rank, cosine_c).

    Deterministic: rank by (rounded cosine desc, neighbor_id asc) so results
    are stable across engines and partitionings. Self-matches excluded.
    """
    qids, qmat, qnrm = _collect_query_matrix(queries, query_id_col, vec_col, max_queries)
    if not len(qids):  # empty probe set -> empty result, not a kernel crash
        return _topk_window(
            embeddings.sparkSession.createDataFrame([], TOPK_SCHEMA), k
        )

    def op(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy().astype("U")
            mat = stack_vectors(pdf["_vec"])
            nrm = np.linalg.norm(mat, axis=1)
            # dot / (|a| * |q|): same form as the SQL oracle's cosine.
            # integerize with floor(x*1e6 + 0.5) — NOT np.round (half-even):
            # the oracles use the identical floor form, so an exact .5 tie
            # integerizes the same on both engines (oracle-parity rule)
            cos_c = np.floor(
                (mat @ qmat.T) / (nrm[:, None] * qnrm[None, :]) * 1e6 + 0.5
            ).astype(np.int64)
            out = []
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                c, nb = cos_c[mask, qi], ids[mask]
                if not len(c):
                    continue
                sel = np.lexsort((nb, -c))[:k]  # batch-local top-k, total order
                out.append(pd.DataFrame({"query_id": qids[qi], "neighbor_id": nb[sel], "cosine_c": c[sel]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(op, schema=TOPK_SCHEMA)
    return _topk_window(scored, k)


def signature_udf(planes: np.ndarray):
    """pandas_udf computing the h-bit hyperplane signature of an
    array<double> column — one numpy matmul per Arrow batch.

    Marked nondeterministic as a PLANNING fence (the kernel is pure):
    it stops Catalyst from duplicating the ArrowEvalPython into
    constraint-inferred filters below the exchange barrier."""

    def sig(col: pd.Series) -> pd.Series:
        return pd.Series(hyperplane_signature(stack_vectors(col), planes))

    return F.pandas_udf(sig, "long").asNondeterministic()


def _cosine_pairs_kernel(batches):
    """mapInPandas kernel over joined candidate rows
    (query_id, qvec, neighbor_id, evec) -> (query_id, neighbor_id, cosine_c).
    Row-wise einsum — vectorized, no per-pair interpreted lambdas."""
    for pdf in batches:
        if not len(pdf):
            continue
        qm = stack_vectors(pdf["qvec"])
        em = stack_vectors(pdf["evec"])
        dots = np.einsum("ij,ij->i", qm, em)
        cos = dots / (np.linalg.norm(qm, axis=1) * np.linalg.norm(em, axis=1))
        yield pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy(),
                "neighbor_id": pdf["neighbor_id"].to_numpy(),
                # floor(x*1e6 + 0.5): same integerization as the SQL oracles
                "cosine_c": np.floor(cos * 1e6 + 0.5).astype(np.int64),
            }
        )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 2048,
    iters: int = 8,
) -> np.ndarray:
    """Deterministic Lloyd k-means over a BOUNDED training sample (ordered
    by id, first ``train_sample`` rows — the standard IVF practice: train
    on a sample, assign the corpus distributively; the corpus itself is
    never collected). Init = first n_lists sample vectors; empty lists
    keep their previous centroid. Returns (n_lists, dim) float64."""
    from conflation_spark.functions.kernels import kmeans_lloyd

    rows = embeddings.orderBy(id_col).limit(train_sample).select(vec_col).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    return kmeans_lloyd(x, n_lists, iters)


def ivf_assign_udf(centroids: np.ndarray):
    """pandas_udf: nearest-centroid list id per vector. Distances are
    computed with the same explicit (x - c)^2 sum the SQL oracle uses, so
    argmin decisions agree bit-for-bit across engines."""

    def assign(col: pd.Series) -> pd.Series:
        mat = stack_vectors(col)
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int64))

    return F.pandas_udf(assign, "long").asNondeterministic()


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: corpus vectors are bucketed by
    nearest centroid (one pandas_udf matmul pass, fully distributed);
    each query probes its ``n_probe`` nearest lists and ranks exact
    cosines within them. The scale sibling of ``lsh_topk`` — list sizes
    are ~N/n_lists, so the candidate join is list-local.
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists, id_col, vec_col)
    assign = ivf_assign_udf(centroids)
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("evec"),
        assign(F.col(vec_col)).alias("list_id"),
    )

    def probe(col: pd.Series) -> pd.Series:
        mat = stack_vectors(col)
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    probe_udf = F.pandas_udf(probe, "array<long>").asNondeterministic()
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_udf(F.col(vec_col))).alias("list_id"),
    )
    joined = F.broadcast(q).join(e, "list_id").where(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select("query_id", "qvec", "neighbor_id", "evec").mapInPandas(
        _cosine_pairs_kernel, schema=TOPK_SCHEMA
    )
    return _topk_window(scored, k)


PQ_M_SUB = 8  # subspaces; each codes dim/M dims through its own codebook
PQ_N_CENTS = 32  # centroids per subspace codebook (256 in classic PQ)


def train_pq_codebooks(
    embeddings: DataFrame,
    m_sub: int = PQ_M_SUB,
    n_cents: int = PQ_N_CENTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 2048,
    iters: int = 8,
) -> np.ndarray:
    """Product-quantization codebooks: split the vector into ``m_sub``
    contiguous subspaces and train an independent ``n_cents``-centroid
    Lloyd k-means per subspace on the same BOUNDED ordered sample the IVF
    trainer uses (the corpus is never collected). Returns
    (m_sub, n_cents, dim // m_sub) float64 — deterministic via the shared
    ``kmeans_lloyd`` kernel, so the DuckDB oracle regenerates identical
    codebook literals."""
    from conflation_spark.functions.kernels import kmeans_lloyd

    rows = embeddings.orderBy(id_col).limit(train_sample).select(vec_col).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    return np.stack(
        [kmeans_lloyd(x[:, m * dsub : (m + 1) * dsub], n_cents, iters) for m in range(m_sub)]
    )


def pq_encode_udf(codebooks: np.ndarray):
    """pandas_udf: array<double> vector -> array<long> of ``m_sub`` codes
    (argmin squared distance per subspace — one vectorized pass per Arrow
    batch; same explicit (x - c)^2 form as the oracle's list_distance
    argmin, so assignments agree across engines). Nondeterministic-marked
    as a planning fence (kernel is pure), matching ``signature_udf``."""
    m_sub, _, dsub = codebooks.shape

    def enc(col: pd.Series) -> pd.Series:
        mat = stack_vectors(col)
        if mat.shape[1] != m_sub * dsub:
            raise ValueError(
                f"vector dim {mat.shape[1]} does not match codebooks "
                f"({m_sub} subspaces x {dsub} dims) — mismatched training?"
            )
        codes = np.empty((len(mat), m_sub), dtype=np.int64)
        for m in range(m_sub):
            sub = mat[:, m * dsub : (m + 1) * dsub]
            d2 = ((sub[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(-1)
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return F.pandas_udf(enc, "array<long>").asNondeterministic()


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus -> (id, codes): the stored PQ index. ``m_sub`` small ints
    per vector replace dim doubles — the 100 TB story: a 64-dim float64
    corpus (512 B/vector) compresses to 8 codes (~8-16 B/vector), so the
    exhaustive ADC scan reads ~50x fewer bytes than brute force while the
    raw vectors stay in cold storage for optional exact re-ranking."""
    return embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )


def _adc_luts(qids, qmat, codebooks):
    """Per-query integer ADC lookup tables, shape (len(qids), m_sub,
    n_cents): LUT[q, m, c] = floor(|qsub_m - centroid_c|^2 * 1e4 + 0.5).
    Integerizing at 1e4 BEFORE summation keeps ``adc_c`` an exact long
    sum in any order — the parity-critical convention shared by
    ``pq_topk`` and ``ivf_pq_topk`` (single source here so the two
    operators cannot drift). Returns (luts, qmat) with qmat normalized
    to shape (0, dim) for an empty probe set so downstream slices and
    broadcasts stay 2-D instead of crashing on a shape-(0,) array."""
    m_sub, n_cents, dsub = codebooks.shape
    if not len(qids):
        qmat = np.zeros((0, m_sub * dsub))
    elif qmat.shape[1] != m_sub * dsub:
        raise ValueError(
            f"query dim {qmat.shape[1]} does not match codebooks "
            f"({m_sub} subspaces x {dsub} dims) — mismatched training?"
        )
    luts = np.empty((len(qids), m_sub, n_cents), dtype=np.int64)
    for m in range(m_sub):
        qsub = qmat[:, m * dsub : (m + 1) * dsub]
        d2 = ((qsub[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(-1)
        luts[:, m, :] = np.floor(d2 * 1e4 + 0.5).astype(np.int64)
    return luts, qmat


def _adc_rank(scored: DataFrame, keep: int) -> DataFrame:
    """Rank ADC-scored candidates by (adc_c asc, neighbor_id asc) and
    keep the top ``keep`` per query — the shared pq/ivf_pq contract."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_c").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= keep)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "adc_c"
        )
    )


def _adc_rerank(adc_ranked, embeddings, queries, k, id_col, vec_col, query_id_col):
    """Exact-cosine re-rank of a broadcastable ADC shortlist: gather the
    raw vectors (corpus scanned once, shortlist broadcast), score with
    the shared cosine kernel, re-rank to top-k — the common rerank tail
    of ``pq_topk`` and ``ivf_pq_topk``."""
    qv = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    ev = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("evec"))
    shortlist = adc_ranked.select("query_id", "neighbor_id")
    joined = F.broadcast(shortlist.join(F.broadcast(qv), "query_id")).join(ev, "neighbor_id")
    exact = joined.select("query_id", "qvec", "neighbor_id", "evec").mapInPandas(
        _cosine_pairs_kernel, schema=TOPK_SCHEMA
    )
    return _topk_window(exact, k)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m_sub: int = PQ_M_SUB,
    n_cents: int = PQ_N_CENTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebooks: np.ndarray | None = None,
    max_queries: int = MAX_QUERY_SET,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization ANN top-k by asymmetric distance computation
    (ADC, Jégou et al. 2011): encode the corpus once, then score every
    (query, vector) pair as sum_m LUT_q[m, code_m] where LUT_q holds the
    squared distances from the query's m-th subvector to that subspace's
    centroids. The scan touches ONLY the codes column; per-vector work is
    an m_sub-element integer gather — no floating point in the
    distributed pass.

    Cross-engine determinism: LUT entries are integerized at 1e4
    (floor(d2 * 1e4 + 0.5)) BEFORE summation, so ``adc_c`` is an exact
    long sum in any order (the bm25 convention). The LUT doubles
    themselves carry the repo's documented 1-ulp caveat (numpy pairwise
    sum vs SQL's sqrt-then-square) — only at an exact .5 boundary of the
    1e4 floor could engines diverge, the same class as the cosine floors.

    Output with ``rerank=0``: (query_id, neighbor_id, rank, adc_c) —
    rank by (adc_c asc, neighbor_id asc); self-matches excluded. ADC
    cannot rank WITHIN a quantization cell (cluster members share codes,
    so their adc_c ties), which is why deployments re-rank: with
    ``rerank=R > 0`` the ADC pass keeps a per-query shortlist of R
    candidates, gathers their RAW vectors (broadcast pair set, corpus
    scanned once — the lsh_topk gather), scores exact cosine, and
    returns (query_id, neighbor_id, rank, cosine_c) like the other ANN
    operators. The compressed scan does the N-scale work; the exact pass
    touches only Q x R vectors.
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(embeddings, m_sub, n_cents, id_col, vec_col)
    m_sub, n_cents, dsub = codebooks.shape
    qids, qmat, _ = _collect_query_matrix(queries, query_id_col, vec_col, max_queries)
    luts, qmat = _adc_luts(qids, qmat, codebooks)
    marange = np.arange(m_sub)
    keep = rerank if rerank else k

    def op(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy().astype("U")
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            out = []
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                if not mask.any():
                    continue
                d = luts[qi, marange[None, :], codes[mask]].sum(axis=1)
                nb = ids[mask]
                sel = np.lexsort((nb, d))[:keep]  # batch-local top-keep, total order
                out.append(
                    pd.DataFrame(
                        {"query_id": qids[qi], "neighbor_id": nb[sel], "adc_c": d[sel]}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = pq_encode(embeddings, codebooks, id_col, vec_col).mapInPandas(
        op, schema="query_id string, neighbor_id string, adc_c long"
    )
    adc_ranked = _adc_rank(scored, keep)
    if not rerank:
        return adc_ranked
    return _adc_rerank(adc_ranked, embeddings, queries, k, id_col, vec_col, query_id_col)


def lsh_tables_udf(planes: np.ndarray, n_tables: int):
    """pandas_udf: array<double> column -> array of n_tables bucket ids
    (one banded matmul per Arrow batch; each band is one LSH table).
    Nondeterministic-marked as a planning fence like ``signature_udf``."""
    from conflation_spark.functions.kernels import banded_hyperplane_signature

    def sig(col: pd.Series) -> pd.Series:
        vals = banded_hyperplane_signature(stack_vectors(col), planes, n_tables)
        return pd.Series(list(vals))

    return F.pandas_udf(sig, "array<long>").asNondeterministic()


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = ANN_N_TABLES,
    n_planes: int = ANN_N_PLANES,
    dim: int = ANN_DIM,
    seed: int = ANN_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multi-table hyperplane-LSH ANN top-k: candidates = union over
    ``n_tables`` independent tables of {query's bucket + all Hamming-1
    buckets} (multi-probe), deduped, then exact cosine rank.

    Single-table LSH recall collapses for moderate-cosine neighbors (one
    8-bit table measured recall@10 = 0.16); independent tables multiply it:
    miss = (1 - p_table)^n_tables. The candidate join stays bucket-local —
    an equi-join on (table_idx, bucket) — so the fan-out at 10^12 vectors is
    n_tables x (n_planes + 1) buckets per query, each ~N/2^n_planes vectors.
    A (query, neighbor) pair can collide in several tables, so candidates
    are deduped (distinct) before the vector join; the dedup shuffle carries
    only id pairs.
    """
    planes = lsh_planes(n_tables * n_planes, dim, seed)
    sig = lsh_tables_udf(planes, n_tables)
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("evec"),
        F.posexplode(sig(F.col(vec_col))).alias("tbl", "bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sig(F.col(vec_col)).alias("qbuckets"),
    )
    # multi-probe per table: own bucket (mask 0) + all n_planes Hamming-1
    masks = F.array(F.lit(0).cast("long"), *[F.lit(1 << i).cast("long") for i in range(n_planes)])
    qp = q.select(
        "query_id",
        "qvec",
        F.posexplode("qbuckets").alias("tbl", "qb"),
    ).select(
        "query_id",
        "qvec",
        "tbl",
        F.explode(F.transform(masks, lambda m: F.col("qb").bitwiseXOR(m))).alias("bucket"),
    )
    cand = (
        F.broadcast(qp.select("query_id", "tbl", "bucket"))
        .join(e.select("neighbor_id", "tbl", "bucket"), ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    ev = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("evec")
    )
    # the pair set is bounded (|queries| x candidate fraction), so BROADCAST
    # it for the vector gather — the corpus is scanned once, never shuffled
    joined = F.broadcast(cand.join(F.broadcast(qv), "query_id")).join(ev, "neighbor_id")
    scored = joined.select("query_id", "qvec", "neighbor_id", "evec").mapInPandas(
        _cosine_pairs_kernel, schema=TOPK_SCHEMA
    )
    return _topk_window(scored, k)


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    m_sub: int = PQ_M_SUB,
    n_cents: int = PQ_N_CENTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    max_queries: int = MAX_QUERY_SET,
    rerank: int = 0,
) -> DataFrame:
    """IVF + PQ composition (the FAISS deployment shape at 10^11
    vectors): the corpus is bucketed by nearest IVF centroid AND encoded
    to PQ codes in one pass; a query probes its ``n_probe`` lists and
    ADC-scans ONLY those lists' codes — the two pruning axes multiply
    (n_probe/n_lists of the rows, ~8-16 B of each). Integer LUT
    gather-sum like ``pq_topk``; optional exact re-rank of the shortlist.

    Codes use the GLOBAL codebook (not per-list residuals): classic
    IVFADC encodes residuals vec - centroid for tighter cells, at the
    cost of per-list LUTs; the global-codebook form keeps codes
    list-independent (an index re-shard never re-encodes) and stays
    exactly replayable in the SQL twin — the re-rank stage recovers the
    accuracy difference at equal scan I/O.

    Output: like ``pq_topk`` — (query_id, neighbor_id, rank, adc_c), or
    cosine_c when ``rerank > 0``.
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists, id_col, vec_col)
    if codebooks is None:
        codebooks = train_pq_codebooks(embeddings, m_sub, n_cents, id_col, vec_col)
    m_sub, n_cents, dsub = codebooks.shape
    enc = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        ivf_assign_udf(centroids)(F.col(vec_col)).alias("list_id"),
        pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )
    qids, qmat, _ = _collect_query_matrix(queries, query_id_col, vec_col, max_queries)
    luts, qmat = _adc_luts(qids, qmat, codebooks)
    qd2 = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probe_lists = np.argsort(qd2, axis=1, kind="stable")[:, :n_probe]
    spark = embeddings.sparkSession
    probes = local_df(
        spark,
        [(str(qids[i]), int(li)) for i in range(len(qids)) for li in probe_lists[i]],
        "query_id string, list_id long",
    )
    qidx = {str(q): i for i, q in enumerate(qids)}
    marange = np.arange(m_sub)
    keep = rerank if rerank else k

    def op(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy().astype("U")
            qs = pdf["query_id"].to_numpy().astype("U")
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            qrow = np.array([qidx[q] for q in qs])
            mask = ids != qs
            if not mask.any():
                continue
            d = luts[qrow[mask][:, None], marange[None, :], codes[mask]].sum(axis=1)
            qs_m, ids_m = qs[mask], ids[mask]
            # batch-local top-keep per query: the window shuffle then
            # carries Q x keep x n_batches rows, not the probed stream
            out = []
            for q in np.unique(qs_m):
                qm = qs_m == q
                nb, dv = ids_m[qm], d[qm]
                sel = np.lexsort((nb, dv))[:keep]
                out.append(
                    pd.DataFrame({"query_id": q, "neighbor_id": nb[sel], "adc_c": dv[sel]})
                )
            yield pd.concat(out, ignore_index=True)

    cand = F.broadcast(probes).join(enc, "list_id")
    scored = cand.select("query_id", "neighbor_id", "codes").mapInPandas(
        op, schema="query_id string, neighbor_id string, adc_c long"
    )
    adc_ranked = _adc_rank(scored, keep)
    if not rerank:
        return adc_ranked
    return _adc_rerank(adc_ranked, embeddings, queries, k, id_col, vec_col, query_id_col)
