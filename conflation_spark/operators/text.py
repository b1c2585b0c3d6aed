"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (regexp/split/aggregate) — no Python in the
hot path. Each operator has a DuckDB-expressible twin in __spark_entry__ so
the driver's oracle gate covers it.

Operators:
- token_count: whitespace tokens + a BPE-ish subword proxy (regex pieces)
- quality_score: length / punctuation-ratio / stopword-ratio heuristics
- lang_id: stopword-hit n-gram heuristic over a fixed per-language lexicon
- fingerprint: md5 of whitespace-normalized lowercase text (exact-dup key)
  plus a k-gram rolling min-hash (content fingerprint robust to small edits)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny, fixed stopword lexicons (shared verbatim with the DuckDB oracles)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "mit", "von", "ein"],
    "es": ["el", "la", "los", "de", "que", "es", "con", "por"],
    "fr": ["le", "la", "les", "des", "est", "avec", "que", "une"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta"],
}

BPE_PIECE_RE = r"[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empty strings removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumn("n_tokens", F.size(tokens_col(t)).cast("long")).withColumn(
        "n_bpe_pieces", F.size(F.regexp_extract_all(F.lower(t), F.lit(BPE_PIECE_RE), 0)).cast("long")
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length, punct ratio, stopword ratio, mean token length + a 0-100
    integer quality score (deterministic, shared with the SQL oracle)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}]", ""))
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    en_sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: x.isin(en_sw)))
    # sum of token lengths == length of the separator-less concat: stays in
    # whole-stage codegen (an F.aggregate lambda runs interpreted per row —
    # CLAUDE.md rule 3)
    mean_tok_len = F.when(n_tokens > 0, F.length(F.concat_ws("", toks)) / n_tokens)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.lit(100)
        - F.when(n_tokens < 5, 40).otherwise(0)
        - F.when(punct_ratio > 0.1, 20).otherwise(0)
        - F.when(mean_tok_len.isNull() | (mean_tok_len < 3) | (mean_tok_len > 12), 20).otherwise(0)
        - F.when(stop_ratio < 0.01, 10).otherwise(0)
    )
    return (
        df.withColumn("n_chars_q", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("punct_ratio_c", F.round(punct_ratio * 10000).cast("long"))
        .withColumn("stop_ratio_c", F.round(stop_ratio * 10000).cast("long"))
        .withColumn("quality_score", score.cast("long"))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax of per-language stopword hits; ties broken by language code
    order (deterministic). Emits the predicted lang + per-lang hit counts."""
    toks = tokens_col(F.col(text_col))
    out = df
    for lang, sws in LANG_STOPWORDS.items():
        out = out.withColumn(
            f"hits_{lang}", F.size(F.filter(toks, lambda x: x.isin(sws))).cast("long")
        )
    # deterministic argmax: max hit count, ties -> first lang in sorted order
    # (expressed as a CASE chain so the DuckDB oracle is literally the same)
    langs = sorted(LANG_STOPWORDS)
    m = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    expr = None
    for lang in langs:
        cond = F.col(f"hits_{lang}") == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return out.withColumn("lang_pred", expr)


def with_fingerprints(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Exact-dup key: md5 of whitespace-normalized lowercase text.
    Rolling-hash content fingerprint: min/max xxhash64 over character
    k-grams of the normalized text (winnowing-lite)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - k + 1, F.lit(1))),
        lambda i: F.xxhash64(norm.substr(i, F.lit(k))),
    )
    return (
        df.withColumn("text_md5", F.md5(norm))
        .withColumn("fp_min", F.array_min(grams).cast("long"))
        .withColumn("fp_max", F.array_max(grams).cast("long"))
    )


# PII patterns shared verbatim with the DuckDB oracle — every construct
# (\b, \d, {m,n}, character classes) means the same thing in Java regex
# (Spark) and RE2 (DuckDB); no lookaround/backrefs, which the dialects
# disagree on. Redaction order is fixed (email -> ip -> phone) and the
# patterns cannot overlap: an email swallows its whole token before the
# IP pattern sees it, IPs have dots where phones have dashes.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass (the C4-style corpus scrub): per-type match
    counts on the RAW text (each type counted independently) plus a
    ``scrubbed`` column with all three types replaced by fixed tokens,
    in the fixed order email -> ip -> phone.

    Scale shape: pure codegen regex column expressions — zero shuffle,
    zero Python; a 100 TB scrub is exactly one map stage that fuses
    with whatever scan or filter surrounds it."""
    t = F.col(text_col)
    out = df
    for name, pat, _tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}s", F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        )
    scrub = t
    for _name, pat, tok in PII_PATTERNS:
        scrub = F.regexp_replace(scrub, pat, tok)
    return out.withColumn("scrubbed", scrub)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    query_terms: "list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 20,
) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set;
    returns the top_k (id, score_c) by score.

    Scale shape: tokens explode ONCE and the `isin(query_terms)` filter
    lands inside the generator's stage, so only matching (doc, term) rows
    ever shuffle; document frequencies and the corpus stats (N, avgdl)
    are tiny broadcast sides; the final top-k plans as TakeOrdered
    (distributed partial top-k), never a global sort.

    Determinism across engines and partitionings: each TERM contribution
    is integerized (floor(x*1e4 + 0.5)) BEFORE the per-doc sum, so the
    sum is over longs — exact and order-independent — where a float sum
    would expose partition order in the low bits. The DuckDB oracle
    integerizes identically.
    """
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).withColumn(
        "dl", F.size("toks").cast("long")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select("id", "dl", F.explode("toks").alias("tok"))
        .where(F.col("tok").isin(list(query_terms)))
        .groupBy("id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_c", F.floor(term_score * F.lit(10000.0) + F.lit(0.5)).cast("long")
        )
        .groupBy("id")
        .agg(F.sum("term_c").alias("score_c"))
    )
    return (
        scored.orderBy(F.col("score_c").desc(), F.col("id"))
        .limit(top_k)
        .select(F.col("id").alias(id_col), "score_c")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Gopher-style repetition signals per document — the standard
    public corpus-quality heuristics (Rae et al., "Scaling Language
    Models: ... Gopher", table A1): for small n the fraction of
    non-whitespace characters covered by the single MOST COMMON word
    n-gram (boilerplate headers), for larger n the fraction covered by
    n-grams occurring more than once (templated/looped text). This
    implementation counts OVERLAPPING occurrences (each n-gram instance
    contributes its characters; the fraction is clamped at 1), which
    keeps both engines' arithmetic identical — documented variant, not
    Gopher's de-overlapped one.

    Output: id_col, total_chars, then top{n}_frac_c / dup{n}_frac_c
    columns integerized at 1e6.

    Scale shape: grams explode once per requested n, then a single
    ``repartition(id)`` lets the (id, n, gram) count, the (id, n)
    reduction AND the per-id pivot all run on that one exchange
    (CLAUDE.md rule 10 — hash(id) satisfies every downstream grouping;
    plan-asserted in tests). No driver collection, no windows."""
    from functools import reduce

    from conflation_spark.operators.dedup import normalized

    ns = sorted(set(top_ns) | set(dup_ns))
    toks = F.filter(F.split(normalized(F.col(text_col)), " "), lambda t: t != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks")).select(
        "id",
        "_toks",
        F.length(F.concat_ws("", "_toks")).alias("total_chars"),
    )

    def grams_n(n: int):
        sz = F.size(F.col("_toks"))
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda i: F.array_join(F.slice(F.col("_toks"), i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    per_n = [
        base.select(
            "id",
            "total_chars",
            F.lit(n).alias("_n"),
            F.explode(grams_n(n)).alias("_g"),
        )
        for n in ns
    ]
    ex = reduce(lambda a, b: a.unionByName(b), per_n).repartition("id")
    gl = F.length(F.col("_g")) - (F.col("_n") - 1)  # chars excl. joiner spaces
    agg = (
        ex.groupBy("id", "total_chars", "_n", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("id", "total_chars", "_n")
        .agg(
            F.max(F.col("_c") * gl).alias("_top"),
            F.sum(F.when(F.col("_c") >= 2, F.col("_c") * gl).otherwise(0)).alias(
                "_dup"
            ),
        )
    )
    piv = (
        agg.groupBy("id")
        .pivot("_n", ns)
        .agg(F.first("_top").alias("top"), F.first("_dup").alias("dup"))
    )
    out = base.select("id", "total_chars").join(piv, "id", "left")

    def frac(col, n):
        num = F.coalesce(col, F.lit(0)).cast("double")
        f = F.when(
            F.col("total_chars") > 0,
            F.least(num / F.col("total_chars"), F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        return F.floor(f * 1e6 + F.lit(0.5)).cast("long")

    sel = [F.col("id").alias(id_col), F.col("total_chars").cast("long")]
    # pivot names columns "<n>_top"/"<n>_dup" for multi-agg pivots
    for n in top_ns:
        sel.append(frac(F.col(f"{n}_top"), n).alias(f"top{n}_frac_c"))
    for n in dup_ns:
        sel.append(frac(F.col(f"{n}_dup"), n).alias(f"dup{n}_frac_c"))
    return out.select(*sel)
