"""Model-based quality scoring (quality_classifier / lm_cross_entropy)
vs exact pure-Python oracles on the text fixture."""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from conflation_spark.operators.lm import (
    CLASSIFIER_SALT,
    WEIGHT_SALT,
    lm_cross_entropy,
    quality_classifier,
    unigram_vocab,
)


@pytest.fixture(scope="module")
def textdocs(spark):
    from conflation_spark.datagen_text import ensure_text_fixture

    d = ensure_text_fixture("sf0.001")
    return spark.read.parquet(f"{d}/textdocs.parquet").cache()


@pytest.fixture(scope="module")
def texts_local(textdocs):
    return {r["text_id"]: r["text"] for r in textdocs.collect()}


def _toks(t):
    return [x for x in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if x]


def _h52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _weight_c(bucket: int) -> int:
    return math.floor(((_h52(f"{WEIGHT_SALT}:{bucket}") / 2**52) * 2 - 1) * 1e6 + 0.5)


def _classifier_oracle(texts, n_buckets, bias=0.0):
    out = {}
    for tid, t in texts.items():
        toks = _toks(t)
        feats = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if not feats:
            continue
        sw = sum(
            _weight_c(_h52(f"{CLASSIFIER_SALT}:{f}") % n_buckets) for f in feats
        )
        logit_c = math.floor((sw / len(feats) / 1e6 + bias) * 1e4 + 0.5)
        out[tid] = (len(feats), logit_c, logit_c >= 0)
    return out


def test_classifier_matches_python_oracle(spark, textdocs, texts_local):
    n_buckets = 512
    got = {
        r["text_id"]: (r["n_features"], r["logit_c"], r["is_quality"])
        for r in quality_classifier(
            textdocs, "text_id", "text", n_buckets=n_buckets
        ).collect()
    }
    want = _classifier_oracle(texts_local, n_buckets)
    assert got == want
    # the hash-derived weights split the corpus, so the threshold is live
    labels = {q for _, _, q in got.values()}
    assert labels == {True, False}


def test_classifier_edge_docs(spark):
    docs = spark.createDataFrame(
        [("a", "solo"), ("b", "  "), ("c", "two tokens here")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["n_features"] for r in
           quality_classifier(docs, n_buckets=64).collect()}
    # empty doc absent; 1 token -> no bigrams; 3 tokens -> 3 + 2 features
    assert got == {"a": 1, "c": 5}


def test_classifier_plan_broadcasts_weights(spark, textdocs):
    plan = quality_classifier(textdocs, "text_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _lm_oracle(texts, score_ids, vocab_k, alpha):
    cnt = Counter()
    for t in texts.values():
        cnt.update(_toks(t))
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k])
    n = sum(cnt.values())
    v = len(vocab)
    c_oov = n - sum(vocab.values())

    def lp_c(tok):
        c = vocab.get(tok, c_oov)
        return math.floor(math.log((c + alpha) / (n + alpha * (v + 1))) * 1e4 + 0.5)

    out = {}
    for tid in score_ids:
        toks = _toks(texts[tid])
        if not toks:
            continue
        s = sum(lp_c(t) for t in toks)
        out[tid] = (len(toks), s, math.floor(-s / len(toks) + 0.5))
    return out


def test_lm_matches_python_oracle(spark, textdocs, texts_local):
    vocab_k, alpha = 16, 0.5  # small vocab forces a live OOV path
    got = {
        r["text_id"]: (r["n_tokens"], r["sum_lp_c"], r["ce_c"])
        for r in lm_cross_entropy(
            textdocs, None, "text_id", "text", vocab_k=vocab_k, alpha=alpha
        ).collect()
    }
    want = _lm_oracle(texts_local, list(texts_local), vocab_k, alpha)
    assert got == want
    # OOV actually exercised: corpus has more types than the vocab cap
    all_types = set().union(*(set(_toks(t)) for t in texts_local.values()))
    assert len(all_types) > vocab_k


def test_lm_separate_reference_corpus(spark, textdocs, texts_local):
    """Score one half against an LM built from the other half — the
    CCNet deployment shape (wiki LM, web corpus)."""
    ref = textdocs.where(F.col("text_id").endswith("0"))
    score = textdocs.where(~F.col("text_id").endswith("0"))
    ref_ids = {tid for tid in texts_local if tid.endswith("0")}
    got = {
        r["text_id"]: (r["n_tokens"], r["sum_lp_c"], r["ce_c"])
        for r in lm_cross_entropy(score, ref, "text_id", "text", vocab_k=16).collect()
    }
    ref_texts = {tid: texts_local[tid] for tid in ref_ids}
    score_ids = set(texts_local) - ref_ids
    # oracle: LM stats from ref only, scoring over the other half
    cnt = Counter()
    for t in ref_texts.values():
        cnt.update(_toks(t))
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:16])
    n, v = sum(cnt.values()), len(vocab)
    c_oov = n - sum(vocab.values())
    for tid in score_ids:
        toks = _toks(texts_local[tid])
        s = sum(
            math.floor(
                math.log((vocab.get(t, c_oov) + 0.5) / (n + 0.5 * (v + 1))) * 1e4 + 0.5
            )
            for t in toks
        )
        assert got[tid] == (len(toks), s, math.floor(-s / len(toks) + 0.5)), tid


def test_lm_vocab_tie_break_deterministic(spark):
    docs = spark.createDataFrame(
        [("a", "zz aa zz aa bb")], "doc_id string, text string"
    )
    vocab = unigram_vocab(docs, "text", vocab_k=2).collect()
    # aa and zz tie at 2; (count desc, token asc) keeps both, bb drops
    assert [(r["tok"], r["c"]) for r in vocab] == [("aa", 2), ("zz", 2)]


def test_lm_gibberish_scores_worse(spark, textdocs):
    """Sanity of the signal itself: a gibberish doc lands above the
    fixture corpus's median cross-entropy."""
    gib = textdocs.sparkSession.createDataFrame(
        [("gib", "xqzv wfjk plmt zzyx qqvw ggth rrnb")], "text_id string, text string"
    )
    scored = lm_cross_entropy(
        textdocs.select("text_id", "text").unionByName(gib), None, "text_id", "text"
    )
    rows = {r["text_id"]: r["ce_c"] for r in scored.collect()}
    ces = sorted(v for k, v in rows.items() if k != "gib")
    assert rows["gib"] > ces[len(ces) // 2]


def test_stateless_scores_equal_batch_plan(spark, textdocs):
    """The per-row kernel (streaming/gate shape) equals the explode +
    broadcast-join + agg batch plan EXACTLY — integer sums and identical
    double mean/scale arithmetic on both paths."""
    from conflation_spark.operators.lm import quality_scores_stateless

    n_buckets = 512
    batch = {
        tuple(r)
        for r in quality_classifier(textdocs, "text_id", "text", n_buckets=n_buckets).collect()
    }
    stateless = {
        tuple(r)
        for r in quality_scores_stateless(
            textdocs, "text_id", "text", n_buckets=n_buckets
        ).collect()
    }
    assert batch == stateless


def _bigram_oracle(texts, score_ids, vocab_k, bigram_k, alpha=0.5):
    """Exact replay of bigram_cross_entropy's math in plain Python."""
    from collections import Counter

    cnt = Counter()
    bi = Counter()
    for t in texts.values():
        toks = _toks(t)
        cnt.update(toks)
        bi.update(zip(toks, toks[1:]))
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k])
    n, v = sum(cnt.values()), len(vocab)
    c_oov = n - sum(vocab.values())
    kept_bi = dict(
        sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:bigram_k]
    )
    backoff_c = math.floor(math.log(0.4) * 1e4 + 0.5)

    def u_lp_c(tok):
        c = vocab.get(tok, c_oov)
        return math.floor(math.log((c + alpha) / (n + alpha * (v + 1))) * 1e4 + 0.5)

    def lp_c(prev, tok):
        if (prev, tok) in kept_bi:
            return math.floor(
                math.log(kept_bi[(prev, tok)] / cnt[prev]) * 1e4 + 0.5
            )
        if prev is None:
            return u_lp_c(tok)
        return backoff_c + u_lp_c(tok)

    out = {}
    for tid in score_ids:
        toks = _toks(texts[tid])
        if not toks:
            continue
        s = sum(lp_c(p, t) for p, t in zip([None] + toks[:-1], toks))
        out[tid] = (len(toks), s, math.floor(-s / len(toks) + 0.5))
    return out


def test_bigram_matches_python_oracle(spark, textdocs, texts_local):
    from conflation_spark.operators.lm import bigram_cross_entropy

    vocab_k, bigram_k = 16, 64  # small caps force OOV + backoff paths live
    got = {
        r["text_id"]: (r["n_tokens"], r["sum_lp_c"], r["ce_c"])
        for r in bigram_cross_entropy(
            textdocs, None, "text_id", "text", vocab_k=vocab_k, bigram_k=bigram_k
        ).collect()
    }
    want = _bigram_oracle(texts_local, list(texts_local), vocab_k, bigram_k)
    assert got == want
    # both paths genuinely exercised: corpus has more bigram types than
    # the cap, and more token types than the vocab cap
    all_bi = set()
    for t in texts_local.values():
        tk = _toks(t)
        all_bi.update(zip(tk, tk[1:]))
    assert len(all_bi) > bigram_k


def test_bigram_lower_ce_than_unigram_on_fluent_text(spark, textdocs):
    """The bigram signal: on the (repetitive) fixture corpus, context
    lowers mean cross-entropy for most documents vs the unigram LM."""
    from conflation_spark.operators.lm import bigram_cross_entropy

    uni = {
        r["text_id"]: r["ce_c"]
        for r in lm_cross_entropy(textdocs, None, "text_id", "text", vocab_k=64).collect()
    }
    bi = {
        r["text_id"]: r["ce_c"]
        for r in bigram_cross_entropy(
            textdocs, None, "text_id", "text", vocab_k=64, bigram_k=4096
        ).collect()
    }
    better = sum(1 for k in uni if bi[k] < uni[k])
    assert better > len(uni) * 0.7
