"""Dedup + text-analysis operators vs brute-force Python oracles on the
planted-duplicate text fixture."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from conflation_spark.datagen_text import ensure_text_fixture
from conflation_spark.operators import dedup, text


@pytest.fixture(scope="module")
def textdocs(spark):
    d = ensure_text_fixture("sf0.001")
    return spark.read.parquet(f"{d}/textdocs.parquet").cache()


@pytest.fixture(scope="module")
def texts_local(textdocs):
    return {r["text_id"]: r["text"] for r in textdocs.collect()}


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower())


def _shingles(t, k=3):
    toks = [x for x in _norm(t).split(" ") if x]
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _jaccard(a, b):
    i = len(a & b)
    return i / (len(a) + len(b) - i) if (a or b) else 0.0


def test_exact_dup_groups(spark, textdocs, texts_local):
    got = {
        (r["text_md5"], r["n_dups"], r["keep_id"])
        for r in dedup.exact_dup_groups(textdocs, "text_id", "text").collect()
    }
    groups = {}
    for tid, t in texts_local.items():
        groups.setdefault(hashlib.md5(_norm(t).encode()).hexdigest(), []).append(tid)
    want = {(m, len(ids), min(ids)) for m, ids in groups.items() if len(ids) > 1}
    assert got == want
    assert len(want) > 3  # planted exact dups found


def test_exact_dedup_keeps_one(spark, textdocs, texts_local):
    kept = dedup.exact_dedup(textdocs, "text_id", "text")
    n_distinct = len({_norm(t) for t in texts_local.values()})
    assert kept.count() == n_distinct


def test_ngram_jaccard_pairs(spark, textdocs, texts_local):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_c"]
        for r in dedup.ngram_jaccard_pairs(textdocs, "text_id", "text", 3, 0.8).collect()
    }
    sh = {tid: _shingles(t) for tid, t in texts_local.items()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _jaccard(sh[a], sh[b])
            if j >= 0.8:
                want[(a, b)] = round(j * 10000)
    assert got == want
    assert len(want) > 5  # planted near+exact dups


def test_minhash_lsh_recall(spark, textdocs, texts_local):
    """On the planted fixture every true pair with j >= 0.8 must be an LSH
    candidate (recall 1.0 — deterministic for this seed); precision is
    whatever banding gives, verified downstream by exact jaccard."""
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(textdocs, "text_id", "text").collect()
    }
    sh = {tid: _shingles(t) for tid, t in texts_local.items()}
    ids = sorted(sh)
    true_pairs = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _jaccard(sh[a], sh[b]) >= 0.8
    }
    assert true_pairs, "fixture must contain high-jaccard pairs"
    assert true_pairs <= cands  # full recall on planted dups


def test_simhash_pairs_vs_bruteforce(spark, textdocs, texts_local):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(textdocs, "text_id", "text", 3).collect()
    }

    def simhash(t):
        toks = str(t).lower().split()
        v = [0] * 64
        for tok in toks:
            h = dedup.hash_token(tok)
            for b in range(64):
                v[b] += 1 if (h >> b) & 1 else -1
        out = 0
        for b in range(64):
            if v[b] > 0:
                out |= 1 << b
        return out

    sims = {tid: simhash(t) for tid, t in texts_local.items() if t and str(t).split()}
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 3:
                # banding guarantee: hamming<=3 pairs share >=1 16-bit chunk
                want[(a, b)] = h
    assert got == want
    assert len(want) > 3


def test_embedding_cosine_pairs(spark):
    d = ensure_text_fixture("sf0.001")
    vecs = spark.read.parquet(f"{d}/vectors.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs(vecs, "vec_id", "vec", 0.95).collect()
    }
    import numpy as np

    rows = vecs.collect()
    v = {r["vec_id"]: np.array(r["vec"]) for r in rows}
    ids = sorted(v)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = float(v[a] @ v[b] / (np.linalg.norm(v[a]) * np.linalg.norm(v[b])))
            if c >= 0.95:
                want.add((a, b))
    assert got == want
    assert len(want) > 5


def test_token_count_and_quality(spark, textdocs, texts_local):
    got = {
        r["text_id"]: (r["n_tokens"], r["quality_score"])
        for r in text.with_quality(textdocs, "text").select(
            "text_id", "n_tokens", "quality_score"
        ).collect()
    }
    for tid, t in texts_local.items():
        toks = [x for x in t.lower().split() if x]
        assert got[tid][0] == len(toks), tid
    scores = [s for _, s in got.values()]
    # junk docs are penalized hard; base docs stay high (vocab has no English
    # stopwords, so the -10 stopword penalty applies to every doc)
    assert min(scores) < 60 and max(scores) >= 90


def test_lang_id_deterministic(spark, textdocs):
    out1 = {r["text_id"]: r["lang_pred"] for r in text.with_lang_id(textdocs).collect()}
    out2 = {
        r["text_id"]: r["lang_pred"]
        for r in text.with_lang_id(textdocs.repartition(5)).collect()
    }
    assert out1 == out2


def test_fingerprints(spark, textdocs, texts_local):
    fp = text.with_fingerprints(textdocs)
    rows = {r["text_id"]: (r["text_md5"], r["fp_min"], r["fp_max"]) for r in fp.collect()}
    for tid, t in texts_local.items():
        assert rows[tid][0] == hashlib.md5(_norm(t).encode()).hexdigest()
    # near-dup docs share no md5 but exact dups do
    assert len({v[0] for v in rows.values()}) < len(rows)


def test_minhash_hot_bucket_cap(spark):
    """A planted boilerplate cluster (f identical docs) makes every band
    bucket size f; with max_bucket_size < f its f^2/2 pair blowup is dropped
    and audited, while small clusters are untouched."""
    rows = [(f"b{i:03d}", "the same boilerplate footer text repeated everywhere") for i in range(60)]
    rows += [(f"u{i:03d}", f"unique doc number {i} with words {i * 7} and {i * 13}") for i in range(20)]
    rows += [("p000", "a near pair alpha beta gamma delta one"),
             ("p001", "a near pair alpha beta gamma delta one")]
    df = spark.createDataFrame(rows, "text_id string, text string")
    capped = dedup.minhash_lsh_pairs(df, "text_id", "text", max_bucket_size=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert ("p000", "p001") in got  # small cluster survives the cap
    assert not any(a.startswith("b") for a, _ in got)  # hot cluster dropped
    hot = dedup.lsh_hot_buckets(df, "text_id", "text", max_bucket_size=50).collect()
    assert hot and all(r["bucket_size"] == 60 for r in hot)  # audit trail
    uncapped = dedup.minhash_lsh_pairs(df, "text_id", "text")
    assert uncapped.count() >= 60 * 59 // 2  # the blowup the cap prevents


def test_ngram_df_cap_bounds_join(spark):
    """Shingles above the document-frequency cap are excluded from both
    intersection and sizes; pairs whose shared shingles are low-df keep
    their exact jaccard."""
    boiler = "all rights reserved contact us for more information today"
    rows = [(f"b{i:03d}", boiler) for i in range(40)]
    rows += [("x000", "alpha beta gamma delta epsilon zeta eta theta"),
             ("x001", "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(rows, "text_id string, text string")
    capped = dedup.ngram_jaccard_pairs(df, "text_id", "text", 3, 0.5, max_doc_freq=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard_c"] for r in capped.collect()}
    assert not any(a.startswith("b") for a, _ in got)  # boilerplate excluded
    # exact jaccard for the low-df pair: 5 shared of 6+6 shingles -> 5/7
    assert got[("x000", "x001")] == round(5 / 7 * 10000)


def test_embedding_cosine_pairs_no_driver_collect(spark):
    """The near-dup plan must be fully distributed: no CollectLimit/collect
    of the corpus — the round-1 version materialized every vector on the
    driver."""
    d = ensure_text_fixture("sf0.001")
    vecs = spark.read.parquet(f"{d}/vectors.parquet")
    plan = dedup.embedding_cosine_pairs(vecs, "vec_id", "vec", 0.95)._jdf.queryExecution().executedPlan().toString()
    assert "Collect" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_matches_python(spark):
    """BM25 vs an independent pure-Python implementation, including the
    per-term integerization contract."""
    import math

    from conflation_spark.operators.text import bm25_topk

    corpus = [
        ("a", "spark shuffle spark index data"),
        ("b", "spark data data data data data data data"),
        ("c", "index index shuffle"),
        ("d", "nothing relevant here at all"),
        ("e", "spark"),
    ]
    df = spark.createDataFrame(corpus, "text_id string, text string")
    got = {
        r["text_id"]: r["score_c"]
        for r in bm25_topk(df, ["spark", "index"], id_col="text_id").collect()
    }
    toks = {i: t.split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        q: sum(1 for v in toks.values() if q in v) for q in ("spark", "index")
    }
    want = {}
    for i, v in toks.items():
        s = 0
        for q in ("spark", "index"):
            tf = v.count(q)
            if not tf:
                continue
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
            term = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(v) / avgdl))
            s += math.floor(term * 10000.0 + 0.5)
        if s:
            want[i] = s
    assert got == want
    # ranking: doc 'a' (two query terms, short) beats spam doc 'b'
    assert got["a"] > got["b"]


def test_repetition_stats_matches_python_oracle(spark):
    """Gopher-style repetition fractions vs a direct Python computation
    over the fixture corpus, plus the plan contract: the exploded gram
    rows shuffle ONCE (the repartition(id)); every later aggregation
    reuses that partitioning (rule-10 subset co-partitioning)."""
    import math
    import re as _re
    from collections import Counter

    d = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{d}/textdocs.parquet")
    out = text.repetition_stats(td, "text_id", "text")
    got = {
        r["text_id"]: (
            r["total_chars"],
            r["top2_frac_c"],
            r["top3_frac_c"],
            r["dup5_frac_c"],
        )
        for r in out.collect()
    }

    def frac(x):
        return math.floor(min(x, 1.0) * 1e6 + 0.5)

    want = {}
    for row in td.select("text_id", "text").collect():
        toks = [t for t in _re.sub(r"\s+", " ", row["text"].strip().lower()).split(" ") if t]
        total = sum(len(t) for t in toks)
        vals = [total]
        for n, kind in ((2, "top"), (3, "top"), (5, "dup")):
            grams = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            if not grams or total == 0:
                vals.append(0)
                continue
            if kind == "top":
                chars = max(c * (len(g) - (n - 1)) for g, c in grams.items())
            else:
                chars = sum(
                    c * (len(g) - (n - 1)) for g, c in grams.items() if c >= 2
                )
            vals.append(frac(chars / total))
        want[row["text_id"]] = tuple(vals)
    assert got == want and len(got) == td.count()
    # planted exact/near dups are self-repetitive corpora members; the
    # metric must separate looped text from unique text
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2, plan
