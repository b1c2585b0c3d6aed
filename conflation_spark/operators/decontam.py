"""Corpus-hygiene operators: benchmark decontamination and cross-document
repeated-span detection — the two standard "is my training set clean"
passes a large-scale LLM data pipeline runs besides near-dup removal.

- ``decontaminate``: flag corpus documents sharing word n-grams with a
  benchmark/eval set (the published convention: GPT-3 appendix C and the
  Llama reports use 13-gram overlap against eval sets). The benchmark is
  assumed tiny relative to the corpus (eval sets are thousands of rows
  against billions) and is BROADCAST after an in-row distinct — the
  corpus side never self-joins and shuffles exactly once, on the doc id,
  with map-side partial aggregation.

- ``repeated_spans``: find exact token windows occurring in >= min_docs
  distinct documents (the windowed variant of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better" — the
  suffix-array substring dedup signal, re-expressed as fixed-width
  window hashing so it distributes). All joins are equi-joins on the
  window hash or the doc id; nothing is ever all-pairs, and a span
  shared by millions of documents stays a single aggregation key with
  partial aggregation, never a fan-out.

Both operators share the whitespace normalization of ``dedup.normalized``
and both have DuckDB-expressible twins in __spark_entry__ (same grams,
same md5 keys), so the driver's oracle gate covers them end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conflation_spark.operators.dedup import normalized

DECONTAM_N = 13  # published convention: 13-gram eval-set overlap
SPAN_WINDOW = 20  # token window for repeated-span detection


def _toks(text: Column) -> Column:
    return F.filter(F.split(normalized(text), " "), lambda t: t != "")


def ngram_set(text: Column, n: int) -> Column:
    """Distinct word n-grams of normalized text; documents shorter than
    n tokens contribute their whole token sequence as one gram (matches
    the convention of the jaccard oracle's gram builder, so short eval
    items still participate instead of silently vanishing)."""
    toks = _toks(text)
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DECONTAM_N,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document benchmark contamination: how many of the document's
    distinct word n-grams appear in ANY benchmark item.

    Output: id_col, n_grams (distinct grams in the doc), n_contaminated
    (grams also present in the benchmark), contam_frac_c (fraction
    integerized at 1e6), is_contaminated (n_contaminated >= min_hits).

    Scale shape: the benchmark gram set is distinct'd (eval sets are
    tiny — thousands of items against a billion-doc corpus) and
    broadcast, so the corpus side sees a broadcast hash join in the same
    stage as its gram explosion; the ONLY corpus shuffle is the final
    groupBy(id) with map-side partial counts. Every doc emits >= 1 gram
    (short docs collapse to one whole-text gram), so no join-back for
    empty docs is needed.
    """
    bench_grams = (
        benchmark.select(F.explode(ngram_set(F.col(bench_text_col), n)).alias("_gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    from conflation_spark.operators.spread import spread_scan

    # spread the corpus scan before the gram explosion (serialized into
    # one task on a sub-split-size local source; no-op at scale) — the
    # final groupBy(_id) then reuses the hash(id) distribution (rule 10)
    ex = spread_scan(docs, id_col).select(
        F.col(id_col).alias("_id"), F.explode(ngram_set(F.col(text_col), n)).alias("_gram")
    )
    joined = ex.join(F.broadcast(bench_grams), "_gram", "left")
    agg = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
    )
    frac = F.floor(
        F.col("n_contaminated") / F.col("n_grams") * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    return agg.select(
        F.col("_id").alias(id_col),
        F.col("n_grams").cast("long"),
        F.col("n_contaminated").cast("long"),
        frac.alias("contam_frac_c"),
        (F.col("n_contaminated") >= min_hits).alias("is_contaminated"),
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SPAN_WINDOW,
    stride: int = 1,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document exact-substring duplication signal: the fraction of
    the document's token windows (width ``window``, step ``stride``)
    whose exact text also occurs in >= min_docs distinct documents.

    Output: id_col, n_windows, n_dup_windows, dup_frac_c (1e6). Docs
    shorter than ``window`` tokens have n_windows = 0 and frac 0.

    Window keys are md5 of the joined token slice — a compact shuffle
    key both engines can compute (the DuckDB twin hashes the identical
    strings; md5 collisions are ignorable at 2^-64 scale and identical
    across engines either way).

    Scale shape: windows are built in-row (one array expression, no
    shuffle); the hot-span aggregation groups by window hash with
    partial aggregation (a boilerplate span in millions of docs is ONE
    grouping key, not a fan-out); flagging is a left-semi equi-join on
    the hash; per-doc counts are one groupBy(id). Stride > 1 trades
    recall for an O(stride) cut in exploded volume — the knob for the
    100 TB tier, where stride=window/2 still catches any duplicated
    region longer than 1.5 windows.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = _toks(F.col(text_col))
    sz = F.size(toks)
    wins = F.when(
        sz >= window,
        F.transform(
            F.sequence(F.lit(1), sz - window + 1, F.lit(stride)),
            lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col).alias("_id"),
        wins.alias("_w"),
    ).select("_id", "_w", F.size("_w").cast("long").alias("n_windows"))
    ex = base.select("_id", F.explode("_w").alias("_h"))
    hot = (
        ex.groupBy("_h")
        .agg(F.countDistinct("_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h")
    )
    dup = (
        ex.join(hot, "_h", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    out = base.select("_id", "n_windows").join(dup, "_id", "left")
    n_dup = F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long")
    frac = F.when(
        F.col("n_windows") > 0,
        F.floor(n_dup / F.col("n_windows") * F.lit(1e6) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    return out.select(
        F.col("_id").alias(id_col),
        "n_windows",
        n_dup.alias("n_dup_windows"),
        frac.alias("dup_frac_c"),
    )
