"""Training-batch construction: document chunking + sequence packing.

The last mile of a pretraining data pipeline: long documents split into
overlapping token windows, then windows (or whole docs) PACKED into
fixed-token-budget training sequences. Both operators here are
deterministic pure functions of the corpus — same outputs on one
executor or a thousand — and SQL-expressible, so they sit under the
repo's DuckDB oracle gate like every other operator. No reference analog
(the reference pipeline ends at speed configs); this is the
LLM-pipeline extension tier.

Chunking is embarrassingly parallel (per-row array ops, JVM codegen).

Packing needs a GLOBAL running token count — the classic distributed
prefix-sum problem. A naive `Window.orderBy(id)` with no partition key
collapses the whole table into ONE task (Spark's unpartitioned-window
trap); instead the cumsum runs two-phase:

    1. one shuffle on a caller-supplied ORDER-ALIGNED bucket column
       (a prefix of the sort key: date, id prefix, file id) computes
       in-bucket running sums with an ordinary window;
    2. per-bucket totals (ONE ROW per bucket) are collected, prefix-summed
       on the driver, and broadcast back as offsets.

The driver-side step is bounded by the bucket count (thousands, not
rows) — the same contractually-bounded-collect pattern as the IVF
training sample. Packing semantics: sequences are laid out by
concatenating docs in sort order and cutting every ``target`` tokens; a
doc's bin is where its FIRST token lands, with a ``straddle`` flag when
it crosses a boundary (offset packing — deterministic, no greedy reset
chain, standard for pretraining token streams).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from conflation_spark.operators.spread import local_df


def chunk_documents(
    df: DataFrame,
    id_col: str = "text_id",
    text_col: str = "text",
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's whitespace tokens into overlapping windows:
    chunk i covers tokens [i*stride, i*stride + window), stride = window
    - overlap; the final chunk may be short; an empty/short doc yields
    its single (possibly empty) chunk. Output: (id, chunk_idx,
    chunk_text, chunk_tokens). All JVM array ops — no shuffle, no UDF."""
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap} / {window}")
    stride = window - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)).cast("double") / F.lit(float(stride))).cast("int")
        + F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, window), " "),
    )
    out = df.select(
        F.col(id_col).alias("id"), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return out.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.size(F.filter(F.split(F.col("chunk_text"), r"\s+"), lambda t: t != ""))
        .cast("long")
        .alias("chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "text_id",
    tokens_col: str = "n_tokens",
    bucket: Column | None = None,
    max_buckets: int = 100_000,
) -> DataFrame:
    """Assign every row a training-sequence bin by offset packing over the
    GLOBAL ``id_col`` order: concatenate token counts in id order and cut
    every ``target_tokens``; a row's ``bin`` is where its first token
    lands, ``bin_offset`` its position inside that bin, ``straddle`` true
    when it crosses into the next bin. Deterministic and
    partitioning-invariant (pure function of (id, n_tokens) pairs).

    ``bucket``: order-aligned coarse column for the two-phase prefix sum
    (MUST sort consistently with ``id_col`` — a prefix of it, a date,
    etc.). Defaults to the id's first 4 characters, which is only
    order-aligned for STRING ids (fixed-width prefixes); numeric ids
    sort numerically while their string prefixes sort lexicographically
    ('10' < '2'), so the default is REFUSED for non-string id columns —
    pass an explicitly order-aligned bucket (e.g. ``F.floor(F.col(id)
    / 1000)`` kept numeric-order-consistent as a zero-padded string).
    The per-bucket totals pass collects one row per bucket — bounded,
    and enforced via ``max_buckets`` BEFORE the collect."""
    if bucket is None:
        id_type = dict(df.dtypes).get(id_col)
        if id_type != "string":
            raise ValueError(
                f"pack_sequences' default bucket (string prefix) is not "
                f"order-aligned for {id_col!r} of type {id_type}; pass an "
                "order-aligned `bucket` column explicitly"
            )
        b = F.substring(F.col(id_col), 1, 4)
    else:
        # buckets travel as strings (driver offsets table); a NUMERIC
        # bucket cast to string sorts lexicographically ('10' < '2') and
        # silently misorders the offsets — require the caller to hand us
        # a string already shaped for lexicographic order (zero-padded
        # numbers, ISO dates, id prefixes)
        btype = df.select(bucket.alias("_b")).schema["_b"].dataType.simpleString()
        if btype != "string":
            raise ValueError(
                f"bucket column has type {btype}; cast it to an "
                "order-aligned STRING yourself (e.g. lpad(CAST(x AS "
                "STRING), w, '0')) so lexicographic bucket order matches "
                f"{id_col!r} order"
            )
        b = bucket
    b = b.cast("string")
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_bkt", b).withColumn(
        "_local_end", F.sum(F.col(tokens_col)).over(w_in)
    )
    # the limit bounds the DRIVER-side collect itself (not just a
    # post-hoc check): at most max_buckets+1 rows ever reach the driver
    totals = (
        local.groupBy("_bkt")
        .agg(F.max("_local_end").alias("_tot"))
        .orderBy("_bkt")
        .limit(max_buckets + 1)
    ).collect()
    if len(totals) > max_buckets:
        raise ValueError(
            f"more than max_buckets={max_buckets} buckets; "
            "coarsen the bucket column"
        )
    offsets = {}
    run = 0
    for r in totals:
        offsets[r["_bkt"]] = run
        run += r["_tot"] or 0
    spark = df.sparkSession
    off_df = F.broadcast(
        local_df(
            spark, [(k, int(v)) for k, v in offsets.items()], "_bkt string, _off long"
        )
    )
    g = local.join(off_df, "_bkt")
    start = F.col("_off") + F.col("_local_end") - F.col(tokens_col)  # global offset
    end = F.col("_off") + F.col("_local_end") - 1  # inclusive last-token offset
    return (
        g.withColumn("bin", F.floor(start / F.lit(target_tokens)).cast("long"))
        .withColumn(
            "bin_offset", (start - F.col("bin") * F.lit(target_tokens)).cast("long")
        )
        .withColumn(
            "straddle",
            F.when(
                F.col(tokens_col) > 0,
                F.floor(end / F.lit(target_tokens)) > F.col("bin"),
            ).otherwise(F.lit(False)),
        )
        .drop("_bkt", "_local_end", "_off")
    )
