"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. Query set broadcast,
  dot products via zip_with/aggregate (JVM-side), per-query top-k via
  row_number. Exact; O(Q x N).
- hyperplane-LSH bucketed ANN: the scale path. h random hyperplanes ->
  h-bit signature; probe the query's bucket plus all Hamming-1 neighbors
  (multi-probe). Join is an equi-join on bucket id, so at 10^12 vectors the
  fan-out is bucket-local; recall measured in tests against brute force.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, rank, cosine_c).

    Deterministic: rank by (rounded cosine desc, neighbor_id asc) so results
    are stable across engines and partitionings. Self-matches excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _norm(F.col(vec_col)).alias("qnrm"),
        )
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("evec"),
        _norm(F.col(vec_col)).alias("enrm"),
    )
    joined = q.crossJoin(e).where(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qvec"), F.col("evec")) / (F.col("qnrm") * F.col("enrm"))
    scored = joined.withColumn("cosine_c", F.round(cos * 1000000).cast("long"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_c").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine_c")
    )


def hyperplane_signature(vec, planes: np.ndarray):
    """h-bit signature column: bit i = (vec . plane_i) > 0."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in planes[i]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i in range(len(planes))
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: candidates = same LSH bucket or any Hamming-1 bucket
    (multi-probe), then exact cosine rank within candidates."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("evec"),
        _norm(F.col(vec_col)).alias("enrm"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnrm"),
        hyperplane_signature(F.col(vec_col), planes).alias("qbucket"),
    )
    # multi-probe: query probes its own bucket + all n_planes Hamming-1 buckets
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
    probes = F.array_union(
        F.array(F.col("qbucket")),
        F.transform(masks, lambda m: F.col("qbucket").bitwiseXOR(m)),
    )
    qp = F.broadcast(q.withColumn("bucket", F.explode(probes)))
    joined = qp.join(e, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qvec"), F.col("evec")) / (F.col("qnrm") * F.col("enrm"))
    scored = joined.withColumn("cosine_c", F.round(cos * 1000000).cast("long")).select(
        "query_id", "neighbor_id", "cosine_c"
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_c").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine_c")
    )
