"""Deterministic text embeddings: feature-hashed tokens + sign random
projection — the embedder stage that closes the pipeline loop
(documents -> embeddings -> PCA / ANN / dedup) entirely in-engine, with
no external model. This is the classic hashing-trick + Achlioptas
sign-projection construction: tokens hash into ``buckets`` counts, and a
{+1,-1} projection matrix (derived from md5, not stored) maps counts to
a ``dim``-dimensional unit vector.

Exactness design (why this hash-gates cleanly): token counts are
integers and projection entries are +-1, so every raw coordinate is an
EXACT integer in any engine/partitioning; the only float step is the
final L2 normalization, and IEEE sqrt/divide are correctly rounded, so
the normalized values are bit-identical across Spark, DuckDB, and the
numpy oracle — no reassociation tolerance needed anywhere.

Scale design: tokenize/hash/count stays JVM-side (codegen split +
explode + md5/conv + groupBy). One explicit repartition on the doc id
makes BOTH downstream groupBys exchange-free (CLAUDE.md rule 10 subset
co-partitioning: (id, bucket) counts and the per-doc collapse reuse the
hash(id) distribution), so the whole operator costs ONE shuffle of
(id, token) rows. The per-doc sparse (bucket, cnt) array then meets the
closure-broadcast projection matrix (buckets x dim int8, ~256 KB) in a
mapInPandas kernel: one integer gather-matmul per document batch, no
per-pair lambdas, no driver collect of the corpus.

Reference scope note: the reference has no text embedder (its
"embedding" is the Valhalla shape-point geometry); this is part of the
LLM-training-data suite, feeding operators/pca.py and
operators/similarity.py.
"""

from __future__ import annotations

import hashlib
import re as _re
from collections import Counter as _Counter
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conflation_spark.operators.text import tokens_col

EMBED_DIM = 64
EMBED_BUCKETS = 4096
EMBED_SEED = 17


def bucket_col(tok: Column, buckets: int = EMBED_BUCKETS) -> Column:
    """Token -> feature bucket: the repo's md5-prefix hash (13 hex chars
    = 52 bits, exact in a long; DuckDB twin:
    ``CAST('0x' || substr(md5(tok), 1, 13) AS BIGINT) % buckets``)."""
    h = F.conv(F.substring(F.md5(tok), 1, 13), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


@lru_cache(maxsize=4)
def projection_matrix(
    buckets: int = EMBED_BUCKETS, dim: int = EMBED_DIM, seed: int = EMBED_SEED
) -> np.ndarray:
    """(buckets, dim) int8 matrix of {+1,-1}, entry (b, d) derived from
    md5(f"{seed}:{b}_{d}") — recomputable in SQL, never shipped as data.
    Cached per shape; ~0.3 s to derive 4096 x 64 once per process."""
    m = np.empty((buckets, dim), dtype=np.int8)
    for b in range(buckets):
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{b}_{d}".encode()).hexdigest()[:13], 16)
            m[b, d] = 1 if h % 2 == 0 else -1
    return m


def embed_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = EMBED_DIM,
    buckets: int = EMBED_BUCKETS,
    seed: int = EMBED_SEED,
) -> DataFrame:
    """(id, embedding array<double>) unit vectors, one row per document
    with at least one token and a nonzero raw projection (empty docs are
    dropped, matching the SQL twin's natural semantics)."""
    from conflation_spark.operators.spread import spread_scan

    counts = (
        # spread BEFORE the explode: on a sub-split-size local source the
        # token md5 hashing (the dominant per-row cost) otherwise runs in
        # a handful of scan tasks; at scale the guard is a no-op and the
        # groupBys shuffle map-side partials as usual (guide §2.3)
        spread_scan(docs, id_col)
        .select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .withColumn("bucket", bucket_col(F.col("tok"), buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("bucket", "cnt")).alias("bc"))
    )
    proj = projection_matrix(buckets, dim, seed)

    def kernel(batches):
        # mapInArrow: the array<struct> column arrives as a ListArray over
        # a StructArray — flatten + one segmented gather-matmul per batch
        # (np.add.reduceat over per-doc segments) instead of a Python loop
        # over rows. Same exact integer raw sums + IEEE normalize as the
        # per-row form, so outputs stay bit-identical (parity-tested).
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            ids = rb.column(0)
            la = rb.column(1)
            n = len(ids)
            if n == 0:
                continue
            lens = pc.list_value_length(la).to_numpy().astype(np.int64)
            flat = la.flatten()
            idx = flat.field("bucket").to_numpy().astype(np.int64)
            cnt = flat.field("cnt").to_numpy().astype(np.int64)
            contrib = proj[idx].astype(np.int64) * cnt[:, None]
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            # collect_list groups are never empty -> strictly increasing
            raw = np.add.reduceat(contrib, starts, axis=0)
            ss = (raw * raw).sum(axis=1)
            mask = ss != 0
            m = int(mask.sum())
            if m == 0:
                continue
            vecs = raw[mask] / np.sqrt(ss[mask].astype(np.float64))[:, None]
            out_ids = ids.filter(pa.array(mask))
            emb = pa.ListArray.from_arrays(
                pa.array(np.arange(m + 1, dtype=np.int32) * raw.shape[1]),
                pa.array(vecs.ravel(), type=pa.float64()),
            )
            yield pa.RecordBatch.from_arrays([out_ids, emb], [id_col, "embedding"])

    schema = f"{id_col} string, embedding array<double>"
    return counts.select(
        F.col(id_col).cast("string").alias(id_col), "bc"
    ).mapInArrow(kernel, schema=schema)


def embedding_entries(emb: DataFrame, id_col: str, scale: int = 1_000_000) -> DataFrame:
    """(id, d, val_c) integerized coordinates — the gated surface."""
    return emb.select(
        id_col, F.posexplode("embedding").alias("d", "v")
    ).select(
        id_col,
        F.col("d").cast("int").alias("d"),
        F.round(F.col("v") * scale).cast("long").alias("val_c"),
    )


# Java's `\s` (used by the batch path's F.split) is ASCII-only; re.ASCII
# matches its exact class [ \t\n\x0B\f\r], keeping the two tokenizers
# identical byte-for-byte on any input
_WS_RE = _re.compile(r"\s+", _re.ASCII)


def embed_one(
    text: str,
    proj: np.ndarray,
    buckets: int = EMBED_BUCKETS,
) -> np.ndarray | None:
    """Single-document embedding, pure Python/numpy — the per-row kernel
    of the stateless path. None for docs with no tokens / zero raw
    projection (matching the aggregate path's drop semantics)."""
    toks = [t for t in _WS_RE.split(text.lower()) if t]
    if not toks:
        return None
    counts = _Counter(
        int(hashlib.md5(t.encode()).hexdigest()[:13], 16) % buckets for t in toks
    )
    idx = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
    cnt = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    raw = proj[idx].astype(np.int64).T @ cnt
    ss = int(raw @ raw)
    if ss == 0:
        return None
    return raw / np.sqrt(float(ss))


def embed_documents_stateless(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = EMBED_DIM,
    buckets: int = EMBED_BUCKETS,
    seed: int = EMBED_SEED,
) -> DataFrame:
    """Per-row embedder: tokenize/hash/count/project inside ONE stateless
    mapInPandas kernel — no shuffle, no state, so it runs unchanged on a
    STREAMING DataFrame (ingest-time embedding). Output is EXACTLY equal
    to ``embed_documents`` (integer raw sums + IEEE normalization; the
    Python tokenizer reproduces the JVM `\\s+`/lower split — parity
    tested). Prefer the aggregate path for batch jobs (JVM tokenize);
    this one exists for streams and trades tokenization to Python."""
    proj = projection_matrix(buckets, dim, seed)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                v = embed_one(text if text is not None else "", proj, buckets)
                if v is None:
                    continue
                ids.append(did)
                vecs.append(v.tolist())
            yield pd.DataFrame({id_col: ids, "embedding": vecs})

    schema = f"{id_col} string, embedding array<double>"
    return docs.select(
        F.col(id_col).cast("string").alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(kernel, schema=schema)
