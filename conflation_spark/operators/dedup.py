"""Deduplication operators for large-scale training-data pipelines.

Scale-first designs (what survives 10^12 docs):
- exact:     hash-groupBy on a normalized digest — one shuffle on the digest;
             skew-free (hashes are uniform).
- minhash:   word-shingle -> n minhash signature -> banded LSH -> bucket
             self-join. The only join is on (band_idx, band_hash) — candidate
             pairs are bucket-local; no all-pairs blowup. Signatures are
             computed with built-in array functions (xxhash64 + transform +
             array_min): no UDF, no explode of the shingle set.
- simhash:   64-bit simhash via a vectorized pandas_udf (numpy bit ops),
             near-dup buckets via 4x16-bit chunk banding (Hamming<=3 pairs
             collide on >=1 chunk by pigeonhole).
- n-gram Jaccard: exact verification for candidate pairs (and a brute-force
             variant for small inputs / oracles).
- embedding cosine: exact near-dup pairs above a cosine threshold; the
             all-pairs form is for oracle-scale inputs, the LSH-bucketed
             form (operators.similarity) is the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 31-bit Mersenne prime: a*h stays under 2^62, no long overflow in ANSI mode
MERSENNE = (1 << 31) - 1


def normalized(text: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_md5, n_dups, keep_id): groups with >1 member; keep_id = min id."""
    h = df.select(F.col(id_col).alias("id"), F.md5(normalized(F.col(text_col))).alias("text_md5"))
    return (
        h.groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("id").alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per normalized-text digest."""
    h = df.withColumn("_md5", F.md5(normalized(F.col(text_col))))
    w_min = F.min(id_col).over(Window.partitionBy("_md5"))
    return h.withColumn("_keep", w_min).where(F.col(id_col) == F.col("_keep")).drop("_md5", "_keep")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram strings (space-joined), built-ins only."""
    toks = F.filter(F.split(normalized(text), " "), lambda t: t != "")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return F.array_distinct(grams)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, mh0..mh{n-1}): minhash signature columns.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod 2^31-1, a_i/b_i fixed by seed.
    Shape: explode shingles ONCE, then n_hashes codegen'd min-aggregates
    over the shared base hash. (Building the signature as one array
    expression is a trap: every downstream reference — e.g. the 16 band
    hashes — inlines and RE-EVALUATES the whole array; with 64 hashes x
    ~60 shingles x 16 bands that was ~60x redundant work.)
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=n_hashes, dtype=np.int64)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g"),
    ).withColumn("h", F.pmod(F.xxhash64("g"), F.lit(MERSENNE)))
    aggs = [
        F.min(
            F.pmod(
                F.pmod(F.lit(int(a[i])) * F.col("h"), F.lit(MERSENNE)) + F.lit(int(b[i])),
                F.lit(MERSENNE),
            )
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash LSH.

    One shuffle on (band_idx, band_hash); hot buckets (boilerplate text) are
    the skew risk at scale — AQE skew-join handles the self-join, and a
    bucket-size cap can be layered on top if needed.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    band_structs = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[F.col(f"mh{bi * rows_per_band + j}") for j in range(rows_per_band)],
                )
            ).alias("band_hash"),
        )
        for bi in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_structs)).alias("b")).select(
        "id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-k-gram Jaccard pairs >= threshold via shingle equi-join
    (only pairs sharing >=1 shingle are ever materialized)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round(F.col("jaccard") * 10000).cast("long").alias("jaccard_c")
    )


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit simhash over whitespace tokens (numpy bit ops)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = str(t).lower().split()
        if not toks:
            continue
        hs = np.array([np.uint64(hash_token(tok)) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
        v = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for bpos in range(64):
            if v[bpos] > 0:
                sim |= np.uint64(1) << np.uint64(bpos)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def hash_token(tok: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across processes, unlike hash())."""
    h = 0xCBF29CE484222325
    for ch in tok.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming.

    Banding: split the 64-bit hash into 4x16-bit chunks; any pair with
    Hamming <= 3 agrees on >= 1 chunk (pigeonhole), so the candidate join is
    an equi-join on (chunk_idx, chunk_value); Hamming verified exactly with
    bit_count.
    """
    simhash64 = F.pandas_udf(_simhash64_batch, "long")  # lazy: needs a session
    s = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    chunks = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright("sh", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", F.col("c.chunk_idx").alias("ci"), F.col("c.chunk_val").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.ci") == F.col("b.ci")) & (F.col("a.cv") == F.col("b.cv"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham.cast("int")).where(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-dup pairs via broadcast-matrix block multiply.

    The naive formulation (all-pairs theta-join + zip_with/aggregate dot
    products) is a trap: Catalyst runs it as a broadcast nested-loop join
    whose parallelism equals the LEFT side's scan splits (often 1 task),
    and higher-order-function lambdas are interpreted, not codegen'd —
    O(N^2 * dim) interpreted ops on one core. Instead: the (small) full
    matrix is closure-broadcast to workers and each mapInPandas batch does
    one BLAS matmul against it — embarrassingly parallel, vectorized.

    At 10^12-vector scale neither works: LSH-bucket first
    (similarity.lsh_topk's hyperplane signatures) and verify within
    buckets; this operator is the exact baseline those buckets feed.
    """
    rows = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).collect()
    ids = np.array([r["id"] for r in rows])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.array([rows[int(i)]["vec"] for i in order], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    matn = mat / norms[:, None]
    id_to_pos = {i: p for p, i in enumerate(ids)}

    def op(batches):
        for pdf in batches:
            pos = np.array([id_to_pos[i] for i in pdf["id"]], dtype=np.int64)
            sims = matn[pos] @ matn.T  # (batch, N) BLAS
            out_a, out_b, out_c = [], [], []
            for k, p in enumerate(pos):
                hits = np.flatnonzero(sims[k] >= threshold)
                for h in hits:
                    if ids[p] < ids[h]:
                        out_a.append(ids[p])
                        out_b.append(ids[h])
                        out_c.append(int(round(sims[k, h] * 10000)))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine_c": out_c})

    v = df.select(F.col(id_col).alias("id")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return v.mapInPandas(op, schema="id_a string, id_b string, cosine_c long")
