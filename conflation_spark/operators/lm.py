"""Model-based document quality scoring: a fastText-style hashed-ngram
linear classifier (batch plan + a stateless per-row streaming variant)
and CCNet-style LM cross-entropy filters (unigram + stupid-backoff
bigram).

Every public web-scale corpus pipeline (CCNet, C4, RefinedWeb, Llama)
gates documents with (a) a cheap linear classifier over hashed bag-of-
ngram features — fastText's architecture: hash features into B buckets,
look each bucket's learned weight up, mean-pool, threshold the logit —
and (b) a language-model perplexity score against a reference corpus
(CCNet buckets pages into head/middle/tail by wiki-LM perplexity;
production systems use KenLM n-gram models — `bigram_cross_entropy` is
that direction with stupid backoff, Brants et al. 2007). The
reference repo has no analog (its filters are GPS-trace physics,
conflation/trace_filter.py); this is a scale-tier extension of the text
suite (`operators/text.py`).

Cross-engine determinism (the repo's oracle-gate rules):
- Classifier weights are a PURE FUNCTION of the bucket id (md5-prefix →
  [-1, 1), integerized at 1e6 BEFORE any sum) standing in for learned
  weights. The Spark side still serves them through the real machinery —
  a broadcast weight-table join, exactly how a trained model ships — while
  the DuckDB twin computes the same weights inline; identical longs come
  out either way.
- Per-token/-feature contributions are integerized before the per-doc
  sum (longs add exactly in any order — the bm25_topk convention,
  text.py:168), so scores are partition-order independent and
  engine-portable; `ln` only ever feeds a 1e4-scaled floor, where a
  1-ulp libm difference cannot practically move the boundary.

Scale shape (both operators): features/tokens explode once, join a tiny
broadcast side (B-bucket weight table / top-K vocab), and reduce with one
hash aggregation on the doc id — one shuffle of (id, long) rows, no
windows, no driver collection. At 100 TB the weight table (2^21 buckets
in real fastText) and the vocab (50k rows) both stay broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conflation_spark.operators.dedup import normalized
from conflation_spark.operators.spread import local_df
from conflation_spark.operators.sketch import KMV_HASH_SPACE

CLASSIFIER_SALT = "ft"  # feature-hash salt, shared verbatim with the oracle
WEIGHT_SALT = "w"  # bucket→weight derivation salt


def _toks(text: Column) -> Column:
    """Whitespace tokens of normalized text (trim/lower/collapse), empty
    removed — byte-identical to the oracle's _DUCK_TOKS construction."""
    return F.filter(F.split(normalized(text), " "), lambda t: t != "")


def _h52(s: Column) -> Column:
    """52-bit md5-prefix content hash (the kmv_hash construction,
    sketch.py:68) — reproducible in DuckDB as
    CAST('0x'||substr(md5(s),1,13) AS BIGINT)."""
    return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("long")


def hashed_weight_table(spark, n_buckets: int) -> DataFrame:
    """The stand-in model: bucket b → weight_c = floor(((h52('w:'||b) /
    2^52) * 2 - 1) * 1e6 + 0.5), a deterministic long in [-1e6, 1e6).
    A trained fastText model would load its learned vector here instead;
    everything downstream (broadcast join, mean pool, threshold) is
    identical."""
    b = F.col("id").cast("long").alias("bucket")
    raw = (
        _h52(F.concat(F.lit(WEIGHT_SALT + ":"), F.col("id").cast("string")))
        / F.lit(KMV_HASH_SPACE)
        * F.lit(2.0)
        - F.lit(1.0)
    )
    w_c = F.floor(raw * F.lit(1e6) + F.lit(0.5)).cast("long").alias("w_c")
    return spark.range(n_buckets).select(b, w_c)


def classifier_features(text: Column) -> Column:
    """Unigram + bigram word features (non-distinct — fastText pools over
    OCCURRENCES, so a repeated token weighs more). Docs with one token
    have no bigrams; empty docs have no features and drop out of the
    scored output (documented contract).

    Perf shape (CLAUDE.md rule 3): the bigram lambda must NOT capture the
    ``toks`` expression subtree — HOF lambdas are interpreted and
    re-evaluate captured children PER ELEMENT, so an index-based
    ``slice(toks, i, 2)`` form re-ran the regex tokenizer O(len) times
    per doc (measured 8.1 s -> 1.0 s class at sf0.1). Zipping two slices
    leaves the lambda touching only its bound struct variable."""
    toks = _toks(text)
    sz = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(sz - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(sz - 1, F.lit(0))),
    )
    bigrams = F.transform(pairs, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    return F.concat(toks, bigrams)


def quality_classifier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    bias: float = 0.0,
    threshold_c: int = 0,
) -> DataFrame:
    """fastText-architecture quality scores: hash each unigram/bigram
    feature into ``n_buckets`` buckets, broadcast-join the per-bucket
    weight, mean-pool into a logit, threshold.

    Output: id_col, n_features (long), logit_c (long — (mean_weight +
    bias) scaled 1e4, floor-half-up), is_quality (logit_c >=
    threshold_c). Docs with zero tokens are absent (no features to
    pool).

    Plan: explode → codegen md5 bucket → BroadcastHashJoin against the
    B-row weight table → one hash aggregation on the id. The per-feature
    weight is already a long, so the sum is exact and partition-order
    independent; only the final mean/bias arithmetic is floating point,
    and it is identical IEEE-754 double math in both engines.
    """
    # no pre-explode size filter: explode drops empty arrays itself, and
    # a Filter here re-evaluates the whole feature expression twice more
    # (constraint inference duplicates it below the exchange — rule 8)
    feats = df.select(
        F.col(id_col).alias("id"), classifier_features(F.col(text_col)).alias("_f")
    ).select("id", F.explode("_f").alias("feat"))
    bucket = F.pmod(
        _h52(F.concat(F.lit(CLASSIFIER_SALT + ":"), F.col("feat"))), F.lit(n_buckets)
    ).alias("bucket")
    weights = hashed_weight_table(df.sparkSession, n_buckets)
    pooled = (
        feats.select("id", bucket)
        .join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(F.sum("w_c").alias("_sw"), F.count(F.lit(1)).alias("n_features"))
    )
    logit = F.col("_sw").cast("double") / F.col("n_features") / F.lit(1e6) + F.lit(bias)
    logit_c = F.floor(logit * F.lit(1e4) + F.lit(0.5)).cast("long")
    return pooled.select(
        F.col("id").alias(id_col),
        "n_features",
        logit_c.alias("logit_c"),
        (logit_c >= F.lit(threshold_c)).alias("is_quality"),
    )


LM_ALPHA = 0.5  # additive-smoothing mass per vocab type (incl. the OOV type)


def token_counts(ref_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, c) table: one explode + hash aggregation over the
    `normalized` whitespace tokens — THE shared token-count subplan
    (unigram_vocab, unigram_lm_table, and bpe.word_frequency_table all
    build on it so tokenizer/tie-break semantics cannot drift apart)."""
    return (
        ref_df.select(F.explode(_toks(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_vocab(
    ref_df: DataFrame | None,
    text_col: str = "text",
    vocab_k: int = 4096,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Top-``vocab_k`` reference-corpus tokens by (count desc, token asc)
    — the deterministic tie-break both engines share. Plans as one token
    aggregation + TakeOrdered; the result is broadcast-sized by
    construction (CCNet keeps ~50k types). Pass ``counts`` (a
    `token_counts` output, possibly persisted) to rank a precomputed
    table instead of re-scanning the corpus."""
    cnt = counts if counts is not None else token_counts(ref_df, text_col)
    return cnt.orderBy(F.col("c").desc(), F.col("tok")).limit(vocab_k)


MAX_VOCAB_K = 1_000_000  # driver-collect bound for the logprob table


def unigram_lm_table(
    ref_df: DataFrame,
    text_col: str = "text",
    vocab_k: int = 4096,
    alpha: float = LM_ALPHA,
    counts: DataFrame | None = None,
) -> tuple[list[tuple[str, int]], int]:
    """Build the smoothed unigram logprob table from the reference
    corpus: ``([(tok, lp_c), ...], oov_lp_c)`` with lp_c = floor(ln((c +
    alpha) / (N + alpha * (V + 1))) * 1e4 + 0.5) — additive smoothing
    over the V retained types plus ONE out-of-vocab pseudo-type that
    carries the whole residual mass (c_oov = N - sum retained), so
    probabilities stay proper and c_oov = 0 stays finite.

    Scale shape: the reference corpus is exploded and aggregated ONCE —
    the (tok, count) table is persisted so the top-k pass and the
    total-count pass both read the aggregation output instead of
    re-scanning the corpus (a naive in-plan formulation scans the corpus
    three times: vocab broadcast + retained-mass stats + total count —
    3x the dominant cost at the 100 TB tier). The collect is
    contract-bounded by ``vocab_k`` (<= MAX_VOCAB_K, fail-fast — the
    similarity.py centroid convention); ln() runs in Python, which both
    the pytest oracle and DuckDB agree with at the 1e4 floor, and the
    scoring plan stays free of libm entirely. Pass ``counts`` (a
    persisted `token_counts` output) to share one aggregation across
    several table builds — the caller then owns its lifecycle.
    """
    import math

    if vocab_k > MAX_VOCAB_K:
        raise ValueError(
            f"vocab_k={vocab_k} exceeds the driver-collect bound "
            f"{MAX_VOCAB_K}; a larger LM belongs in a distributed join"
        )
    owns = counts is None
    cnt = token_counts(ref_df, text_col).persist() if owns else counts
    try:
        vocab_rows = [
            (r["tok"], r["c"])
            for r in unigram_vocab(None, text_col, vocab_k, counts=cnt).collect()
        ]
        n = cnt.agg(F.sum("c")).collect()[0][0] or 0
    finally:
        if owns:
            cnt.unpersist()
    if n == 0:
        raise ValueError("reference corpus has no tokens; cannot build an LM")
    v = len(vocab_rows)
    denom = float(n) + alpha * (float(v) + 1.0)

    def lp_c(c: int) -> int:
        return math.floor(math.log((float(c) + alpha) / denom) * 1e4 + 0.5)

    c_oov = n - sum(c for _, c in vocab_rows)
    return [(t, lp_c(c)) for t, c in vocab_rows], lp_c(c_oov)


def lm_cross_entropy(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 4096,
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """CCNet-style unigram-LM scoring: build a smoothed logprob table
    from the reference corpus (``ref_df``, default: the corpus itself —
    CCNet's deployment trains on a separate wiki corpus) and score every
    document by cross-entropy (negative mean token logprob — low =
    fluent/common text, high = gibberish or out-of-domain; CCNet
    thresholds these into head/middle/tail buckets).

    Output: id_col, n_tokens (long), sum_lp_c (long — per-token logprob
    scaled 1e4 and floored BEFORE the sum, exact in any order), ce_c
    (long — floor(-sum_lp_c / n_tokens + 0.5): cross-entropy scaled 1e4).
    Zero-token docs are absent.

    Plan: the LM table build scans the reference corpus once
    (``unigram_lm_table``); the scoring pass explodes doc tokens once,
    left-joins the BROADCAST logprob table (null → OOV logprob literal),
    and reduces with one hash aggregation on the id — one shuffle, no
    windows, no libm in the distributed plan.
    """
    spark = df.sparkSession
    table, oov_lp_c = unigram_lm_table(
        ref_df if ref_df is not None else df, text_col, vocab_k, alpha
    )
    lp_table = local_df(spark, table, "tok string, lp_c long")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_toks(F.col(text_col))).alias("tok")
    )
    scored = (
        toks.join(F.broadcast(lp_table), "tok", "left")
        .select("id", F.coalesce(F.col("lp_c"), F.lit(oov_lp_c)).alias("lp_c"))
        .groupBy("id")
        .agg(F.sum("lp_c").alias("sum_lp_c"), F.count(F.lit(1)).alias("n_tokens"))
    )
    ce_c = F.floor(
        -F.col("sum_lp_c").cast("double") / F.col("n_tokens") + F.lit(0.5)
    ).cast("long")
    return scored.select(
        F.col("id").alias(id_col), "n_tokens", "sum_lp_c", ce_c.alias("ce_c")
    )


def classifier_weights_array(n_buckets: int):
    """The stand-in weight table as a numpy int64 array indexed by bucket
    — value-identical to `hashed_weight_table` (same md5 derivation), for
    kernels that need the weights in closure instead of as a join side."""
    import hashlib
    import math

    import numpy as np

    out = np.empty(n_buckets, dtype=np.int64)
    for b in range(n_buckets):
        h = int(hashlib.md5(f"{WEIGHT_SALT}:{b}".encode()).hexdigest()[:13], 16)
        out[b] = math.floor(((h / float(2**52)) * 2.0 - 1.0) * 1e6 + 0.5)
    return out


def quality_scores_stateless(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    bias: float = 0.0,
    threshold_c: int = 0,
) -> DataFrame:
    """Per-ROW formulation of `quality_classifier`: one Arrow-batched
    pandas kernel computes each document's (n_features, logit_c,
    is_quality) with the weights in closure — zero shuffle, zero state,
    so the SAME operator runs under ``readStream`` (an ingest-time
    quality gate) and batch, with EXACT output equality to the
    explode → broadcast-join → agg batch plan (integer feature sums;
    identical IEEE double mean/scale; tokenizer uses the ASCII-flagged
    regex so word boundaries match Java ``\\s`` — the bpe.py parity
    rule). The batch plan remains preferable for batch (JVM codegen
    hashing); this is the streaming/gate shape.
    """
    import hashlib
    import math
    import re

    import pandas as pd

    weights = classifier_weights_array(n_buckets)
    ws = re.compile(r"\s+", re.ASCII)
    salt = (CLASSIFIER_SALT + ":").encode()

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, nf, lc, q = [], [], [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                norm = ws.sub(" ", (text or "").lower()).strip(" \t\n\x0b\f\r")
                toks = [t for t in norm.split(" ") if t]
                feats = toks + [
                    toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
                ]
                if not feats:
                    continue  # zero-token docs are absent (batch contract)
                sw = 0
                for f_ in feats:
                    h = int(hashlib.md5(salt + f_.encode()).hexdigest()[:13], 16)
                    sw += int(weights[h % n_buckets])
                logit_c = math.floor((sw / len(feats) / 1e6 + bias) * 1e4 + 0.5)
                ids.append(did)
                nf.append(len(feats))
                lc.append(logit_c)
                q.append(logit_c >= threshold_c)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_features": pd.array(nf, dtype="int64"),
                    "logit_c": pd.array(lc, dtype="int64"),
                    "is_quality": pd.array(q, dtype="boolean"),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    out = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(
        score,
        schema=f"id {id_type}, n_features long, logit_c long, is_quality boolean",
    )
    return out.select(
        F.col("id").alias(id_col), "n_features", "logit_c", "is_quality"
    )


BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007)
MAX_BIGRAM_K = 2_000_000  # driver-collect bound for the bigram table


def bigram_lm_tables(
    ref_df: DataFrame,
    text_col: str = "text",
    vocab_k: int = 4096,
    bigram_k: int = 65_536,
    alpha: float = LM_ALPHA,
):
    """Build the stupid-backoff bigram LM from the reference corpus:
    returns ``(uni_table, oov_lp_c, bi_table, backoff_c)`` where
    uni_table is the smoothed `unigram_lm_table` output, bi_table is
    ``[(prev, tok, lp_c)]`` for the top ``bigram_k`` bigrams with
    lp_c = floor(ln(c(prev,tok) / c(prev)) * 1e4 + 0.5) (MLE over the
    unigram context count — the stupid-backoff convention, no smoothing
    on the retained bigrams), and backoff_c = floor(ln(0.4) * 1e4 + 0.5)
    is the constant penalty added to the unigram logprob when a bigram
    is unseen.

    Exactly TWO reference-corpus passes: the token-count aggregation is
    computed once, persisted, and shared by the unigram table, the
    total count, and the bigram-context counts c(prev) (the c(prev)
    lookup joins the persisted aggregate against the small prev set —
    never an isin() with tens of thousands of literals in the plan, and
    never a corpus rescan); the bigram explode + aggregation is the
    second pass. All collects are contract-bounded and fail-fast.
    """
    import math

    if bigram_k > MAX_BIGRAM_K:
        raise ValueError(
            f"bigram_k={bigram_k} exceeds the driver bound {MAX_BIGRAM_K}"
        )
    spark = ref_df.sparkSession
    cnt = token_counts(ref_df, text_col).persist()
    try:
        uni_table, oov_lp_c = unigram_lm_table(
            ref_df, text_col, vocab_k, alpha, counts=cnt
        )
        toks = _toks(F.col(text_col))
        sz = F.size(toks)
        pairs = F.arrays_zip(
            F.slice(toks, 1, F.greatest(sz - 1, F.lit(0))).alias("prev"),
            F.slice(toks, 2, F.greatest(sz - 1, F.lit(0))).alias("tok"),
        )
        bi_cnt = (
            ref_df.select(F.explode(pairs).alias("p"))
            .select(F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
            .groupBy("prev", "tok")
            .agg(F.count(F.lit(1)).alias("c2"))
            .orderBy(F.col("c2").desc(), F.col("prev"), F.col("tok"))
            .limit(bigram_k)
        )
        bi_rows = bi_cnt.collect()
        prevs = sorted({r["prev"] for r in bi_rows})
        prev_df = local_df(spark, [(p,) for p in prevs], "tok string")
        c1 = {
            r["tok"]: r["c"]
            for r in cnt.join(F.broadcast(prev_df), "tok").collect()
        }
    finally:
        cnt.unpersist()
    bi_table = [
        (
            r["prev"],
            r["tok"],
            math.floor(math.log(float(r["c2"]) / float(c1[r["prev"]])) * 1e4 + 0.5),
        )
        for r in bi_rows
    ]
    backoff_c = math.floor(math.log(BACKOFF) * 1e4 + 0.5)
    return uni_table, oov_lp_c, bi_table, backoff_c


def bigram_cross_entropy(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 4096,
    bigram_k: int = 65_536,
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """Stupid-backoff bigram cross-entropy (the CCNet/KenLM direction one
    order up from `lm_cross_entropy`): lp(t | prev) = the retained
    bigram's MLE logprob when (prev, t) is in the top-``bigram_k`` table,
    else ln(0.4) + unigram lp(t); a document's first token scores as a
    pure unigram. Per-token logprobs are integerized at 1e4 BEFORE the
    per-doc sum (exact longs); output schema matches `lm_cross_entropy`
    (id, n_tokens, sum_lp_c, ce_c).

    Plan: LM tables build in two bounded reference passes
    (`bigram_lm_tables`); scoring makes (prev, tok) pairs per doc with
    the zip-slices construction (no per-element subtree re-evaluation —
    rule 3), explodes ONCE, left-joins the two BROADCAST tables, and
    reduces with one hash aggregation — one shuffle, no libm in the
    distributed plan.
    """
    spark = df.sparkSession
    uni_table, oov_lp_c, bi_table, backoff_c = bigram_lm_tables(
        ref_df if ref_df is not None else df, text_col, vocab_k, bigram_k, alpha
    )
    uni = local_df(spark, uni_table, "tok string, u_lp_c long")
    bi = local_df(spark, bi_table, "prev string, tok string, b_lp_c long")
    toks = _toks(F.col(text_col))
    sz = F.size(toks)
    pairs = F.arrays_zip(
        F.concat(F.array(F.lit(None).cast("string")), F.slice(toks, 1, F.greatest(sz - 1, F.lit(0)))).alias("prev"),
        toks.alias("tok"),
    )
    # arrays_zip NULL-PADS unequal lengths: for a zero-token doc the
    # [NULL]-prefixed prev array zips against empty toks into one
    # {prev: NULL, tok: NULL} element — drop it post-explode (real
    # tokens are never null; _toks filters empties), keeping the
    # "zero-token docs are absent" contract and oracle parity
    exploded = (
        df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
        .select("id", F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
        .where(F.col("tok").isNotNull())
    )
    scored = (
        exploded.join(F.broadcast(bi), ["prev", "tok"], "left")
        .join(F.broadcast(uni), ["tok"], "left")
        .select(
            "id",
            F.when(F.col("b_lp_c").isNotNull(), F.col("b_lp_c"))
            .when(  # doc-initial token: no context -> pure unigram, no penalty
                F.col("prev").isNull(),
                F.coalesce(F.col("u_lp_c"), F.lit(oov_lp_c)),
            )
            .otherwise(
                F.lit(backoff_c) + F.coalesce(F.col("u_lp_c"), F.lit(oov_lp_c))
            )
            .alias("lp_c"),
        )
        .groupBy("id")
        .agg(F.sum("lp_c").alias("sum_lp_c"), F.count(F.lit(1)).alias("n_tokens"))
    )
    ce_c = F.floor(
        -F.col("sum_lp_c").cast("double") / F.col("n_tokens") + F.lit(0.5)
    ).cast("long")
    return scored.select(
        F.col("id").alias(id_col), "n_tokens", "sum_lp_c", ce_c.alias("ce_c")
    )
