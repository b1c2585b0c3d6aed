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

from conflation_spark.functions.kernels import lsh_planes, stack_vectors

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
    from conflation_spark.operators.spread import spread_scan

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=n_hashes, dtype=np.int64)
    # spread on id: the explode runs on every core instead of inside a
    # single sub-split-size scan task, and the groupBy(id) below reuses
    # the hash(id) distribution (rule 10) — no second exchange
    sh = spread_scan(df, id_col).select(
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


def band_hash_structs(bands: int, rows_per_band: int) -> list:
    """The band packing — xxhash64 over the comma-joined mh columns of
    each band — as struct expressions. ONE definition shared by the
    batch ``_minhash_banded`` and the streaming per-row formulation
    (streaming/ingest.stateless_minhash_bands): band hashes from the two
    paths MUST stay byte-comparable (checkpoints, parity tests), so the
    packing cannot be allowed to drift between copies."""
    return [
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


def drop_hot_buckets(
    banded: DataFrame, cols: list[str], max_bucket_size: int
) -> DataFrame:
    """Drop rows of band buckets larger than the cap — the boilerplate
    guard shared by the batch LSH join, the embedding band join, and the
    incremental checkpoint/delta paths (one definition, so 'hot bucket'
    cannot silently mean different things on different paths)."""
    wb = Window.partitionBy(*cols)
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(wb))
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def _minhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_k: int,
) -> DataFrame:
    """(id, band_idx, band_hash) rows — one per (doc, band)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    band_structs = band_hash_structs(bands, rows_per_band)
    return sig.select("id", F.explode(F.array(*band_structs)).alias("b")).select(
        "id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )


def lsh_hot_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Audit companion of ``minhash_lsh_pairs``: the band buckets whose size
    exceeds the cap (band_idx, band_hash, bucket_size) — i.e. what the cap
    dropped. Callers log/persist this next to the pairs output."""
    banded = _minhash_banded(df, id_col, text_col, n_hashes, bands, shingle_k)
    return (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket_size)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash LSH.

    One shuffle on (band_idx, band_hash); hot buckets (boilerplate text)
    are the skew risk at scale: a band bucket of size f self-joins into
    f^2/2 candidate rows. ``max_bucket_size`` drops buckets above the cap
    BEFORE the self-join, bounding any bucket's contribution to
    cap^2/2 pairs. Pairs that also collide in a non-hot band are still
    found (boilerplate clusters usually collide in every band, so a
    dropped cluster is dropped deliberately — use ``lsh_hot_buckets`` to
    audit what the cap removed).
    """
    banded = _minhash_banded(df, id_col, text_col, n_hashes, bands, shingle_k)
    if max_bucket_size is not None:
        banded = drop_hot_buckets(banded, ["band_idx", "band_hash"], max_bucket_size)
    # both self-join sides reference the band table and Catalyst does not
    # CSE across subtrees — materialize the (id, band_idx, band_hash)
    # proxy rows once (guide §8) instead of hashing the corpus twice
    banded = banded.localCheckpoint(eager=True)
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
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Word-k-gram Jaccard pairs >= threshold via shingle equi-join
    (only pairs sharing >=1 shingle are ever materialized).

    ``max_doc_freq``: drop shingles appearing in more than this many docs
    BEFORE the self-join. Without it a stop-shingle shared by f docs
    materializes f^2 join rows — the scale killer for boilerplate text.
    Jaccard is then computed over the df-filtered shingle sets (both
    intersection and sizes exclude dropped shingles). Capped Jaccard is NOT
    exact Jaccard and can err in either direction: dropping a non-shared
    high-DF shingle shrinks the union only (capped > exact), dropping a
    SHARED one shrinks intersection and union together ((i-1)/(u-1) < i/u,
    capped < exact). The two agree exactly iff no shingle of either doc
    exceeds the cap. The DuckDB oracle applies the same cap, so the gate
    checks the capped semantics exactly.
    """
    from conflation_spark.operators.spread import spread_scan

    sh = spread_scan(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g")
    )
    if max_doc_freq is not None:
        wg = Window.partitionBy("g")
        sh = (
            sh.withColumn("_df", F.count(F.lit(1)).over(wg))
            .where(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    # The (id, g) shingle table feeds FOUR plan subtrees (both self-join
    # sides + both size lookups) and Catalyst does not CSE across
    # subtrees: without materialization the explode + doc-freq window
    # re-evaluates four times per execution (measured 4 Generate+Window
    # chains in the r6 before-plan). One eager localCheckpoint is the
    # guide-§8 "decision pass": materialize the lightweight proxy rows
    # once, then every downstream decision reads the materialized form.
    sh = sh.localCheckpoint(eager=True)
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
    """Batch-vectorized 64-bit simhash (functions.kernels.simhash64: padded
    byte-matrix FNV sweep + reduceat bit sums — no per-row Python loops).
    The same kernel precomputes the fixture's ``simhash`` column at datagen
    time, which is what the DuckDB oracle reads."""
    from conflation_spark.functions.kernels import simhash64

    return pd.Series(simhash64(texts))


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
    bit_count. A pair agreeing on several chunks is kept only where
    chunk_idx == its FIRST agreeing chunk (computable from the two hashes
    in-row), so no distinct shuffle is needed.
    """
    # asNondeterministic is a PLANNING fence, not a semantics statement (the
    # kernel is pure): without it, constraint inference derives
    # isnotnull(sh) from the join predicates and pushes it below as
    # Filter(isnotnull(udf(text))) — a SECOND ArrowEvalPython per join side
    # that re-hashes every document. Measured 2x on this query.
    simhash64 = F.pandas_udf(_simhash64_batch, "long").asNondeterministic()
    # Exchange barrier right after the UDF: an ArrowEvalPython output that is
    # referenced downstream is RE-EVALUATED per reference (the python-UDF
    # analog of CLAUDE.md rule 2). The cheap hash shuffle materializes the
    # signature once per side; AQE stage reuse shares the identical shuffle
    # across the self-join's two sides.
    s = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh")).repartition(
        "id"
    )
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
    cand = a.join(
        b,
        (F.col("a.ci") == F.col("b.ci"))
        & (F.col("a.cv") == F.col("b.cv"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.sh").bitwiseXOR(F.col("b.sh")).alias("sh_xor"),
        F.col("a.ci").alias("ci"),
    )
    chunk_agrees = [
        F.shiftright("sh_xor", 16 * i).bitwiseAND(F.lit(0xFFFF)) == 0 for i in range(4)
    ]
    first_chunk = F.when(chunk_agrees[0], 0)
    for i in range(1, 4):
        first_chunk = first_chunk.when(chunk_agrees[i], i)
    ham = F.bit_count(F.col("sh_xor"))
    return (
        cand.where(F.col("ci") == first_chunk)
        .withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# banded hyperplane-LSH family for embedding near-dup detection: 144 planes
# = 12 bands x 12 bits. A pair agrees with a random plane w.p.
# p = 1 - theta/pi; a 12-plane band matches w.p. p^12 and the pair is
# missed w.p. (1 - p^12)^12:
#   cosine 0.95 (theta 18deg, p=.90): miss ~2%   (threshold boundary)
#   cosine 0.99 (theta  8deg, p=.955): miss ~2e-4
#   cosine 0.999 (real near-dups):     miss <1e-9 — deterministic recall
# 12-bit band values (4096 buckets/band) keep unrelated vectors apart
# (random pair collides per band w.p. ~2^-12), so bucket self-joins stay
# near-linear; a bucket-size cap bounds adversarial boilerplate clusters.
EMB_LSH_BANDS = 12
EMB_LSH_BITS_PER_BAND = 12
EMB_LSH_SEED = 137


def banded_signature_udf(planes: np.ndarray, n_bands: int):
    """pandas_udf: array<double> column -> array of n_bands band values
    (one matmul per Arrow batch, functions.kernels.banded_hyperplane_signature)."""
    from conflation_spark.functions.kernels import banded_hyperplane_signature

    def sig(col: pd.Series) -> pd.Series:
        vals = banded_hyperplane_signature(stack_vectors(col), planes, n_bands)
        return pd.Series(list(vals))

    # planning fence, not a semantics statement — see signature_udf
    return F.pandas_udf(sig, "array<long>").asNondeterministic()


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs above ``threshold`` via banded hyperplane LSH +
    vectorized within-bucket verification. NO driver materialization: the
    corpus never leaves the executors (the round-1 form collected every
    vector to the driver — OOM at any real scale).

    Plan shape (all distributed):
      1. 12 x 12-bit band values per vector — one numpy matmul per Arrow
         batch (kernels.banded_hyperplane_signature), posexploded to
         (band_idx, band_val) rows.
      2. Self-join on (band_idx, band_val) with id_a < id_b — candidate
         pairs are bucket-local; distinct dedups multi-band collisions.
      3. Join the two vectors back and verify exact cosine in a vectorized
         mapInPandas kernel (einsum per batch).

    Recall is probabilistic at the threshold boundary (~98% at cosine
    exactly 0.95, see the family constants above) and effectively exact
    for real near-duplicates (cosine > 0.99). ``max_bucket_size`` bounds
    boilerplate bucket blowup like ``minhash_lsh_pairs``.
    """
    planes = lsh_planes(EMB_LSH_BANDS * EMB_LSH_BITS_PER_BAND, dim, EMB_LSH_SEED)
    sig = banded_signature_udf(planes, EMB_LSH_BANDS)
    # exchange barrier after the UDF (see simhash_pairs): evaluate the
    # signature matmul once, not once per self-join side
    s = df.select(F.col(id_col).alias("id"), sig(F.col(vec_col)).alias("bands")).repartition(
        "id"
    )
    banded = s.select("id", F.posexplode("bands").alias("band_idx", "band_val"))
    if max_bucket_size is not None:
        banded = drop_hot_buckets(banded, ["band_idx", "band_val"], max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    return verify_cosine_pairs(pairs, df, id_col, vec_col, threshold)


def verify_cosine_pairs(
    pairs: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact-cosine verification of candidate (id_a, id_b) pairs against a
    vector table: join both vectors back, verify in a vectorized
    mapInPandas kernel (einsum per Arrow batch), keep pairs at/above
    ``threshold``. Shared by the batch LSH path and the incremental path
    — the candidates differ, the verification contract doesn't."""
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    withvecs = pairs.join(va, "id_a").join(vb, "id_b")

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ma = stack_vectors(pdf["vec_a"])
            mb = stack_vectors(pdf["vec_b"])
            cos = np.einsum("ij,ij->i", ma, mb) / (
                np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            )
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    # floor(x*1e4 + 0.5): same integerization as the oracle
                    "cosine_c": np.floor(cos[keep] * 10000 + 0.5).astype(np.int64),
                }
            )

    return withvecs.mapInPandas(verify, schema="id_a string, id_b string, cosine_c long")
