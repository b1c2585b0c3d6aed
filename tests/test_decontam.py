"""Corpus-hygiene operators (decontaminate / repeated_spans) vs
brute-force Python oracles on the planted-duplicate text fixture."""

import re

import pytest
from pyspark.sql import functions as F

from conflation_spark.datagen_text import ensure_text_fixture
from conflation_spark.operators.decontam import decontaminate, repeated_spans


@pytest.fixture(scope="module")
def textdocs(spark):
    d = ensure_text_fixture("sf0.001")
    return spark.read.parquet(f"{d}/textdocs.parquet").cache()


@pytest.fixture(scope="module")
def texts_local(textdocs):
    return {r["text_id"]: r["text"] for r in textdocs.collect()}


def _toks(t):
    return [x for x in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if x]


def _grams(t, n):
    toks = _toks(t)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _windows(t, w):
    toks = _toks(t)
    return [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]


def test_decontaminate_matches_python_oracle(spark, textdocs, texts_local):
    n = 13
    bench_ids = {tid for tid in texts_local if tid.endswith("0")}
    bench_grams = set().union(
        *(_grams(texts_local[tid], n) for tid in bench_ids)
    )
    bench = textdocs.where(F.col("text_id").endswith("0"))
    corpus = textdocs.where(~F.col("text_id").endswith("0"))
    got = {
        r["text_id"]: (r["n_grams"], r["n_contaminated"], r["is_contaminated"])
        for r in decontaminate(corpus, bench, "text_id", "text", n=n).collect()
    }
    assert set(got) == set(texts_local) - bench_ids
    any_contaminated = False
    for tid in got:
        g = _grams(texts_local[tid], n)
        hits = len(g & bench_grams)
        assert got[tid] == (len(g), hits, hits >= 1), tid
        any_contaminated |= hits >= 1
    # the planted dup clusters straddle the bench/corpus split
    assert any_contaminated


def test_decontaminate_short_docs_participate(spark):
    """Docs and bench items shorter than n tokens collapse to one
    whole-text gram — an eval item of 3 words still contaminates its
    verbatim copy."""
    docs = spark.createDataFrame(
        [("d1", "tiny eval snippet"), ("d2", "something else entirely here")],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame([("b1", "Tiny  EVAL snippet")], "bid string, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"])
        for r in decontaminate(docs, bench, n=13).collect()
    }
    assert got == {"d1": (1, 1), "d2": (1, 0)}


def test_repeated_spans_matches_python_oracle(spark, textdocs, texts_local):
    w, min_docs = 20, 2
    # python oracle: window -> set of docs containing it
    owners = {}
    for tid, t in texts_local.items():
        for win in set(_windows(t, w)):
            owners.setdefault(win, set()).add(tid)
    hot = {win for win, ids in owners.items() if len(ids) >= min_docs}
    got = {
        r["text_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in repeated_spans(textdocs, "text_id", "text", window=w).collect()
    }
    assert set(got) == set(texts_local)
    n_dup_docs = 0
    for tid, t in texts_local.items():
        wins = _windows(t, w)
        n_dup = sum(1 for win in wins if win in hot)
        assert got[tid] == (len(wins), n_dup), tid
        n_dup_docs += n_dup > 0
    assert n_dup_docs > 10  # planted exact/near dups share spans


def test_repeated_spans_stride_and_short_docs(spark):
    docs = spark.createDataFrame(
        [
            ("a", " ".join(str(i) for i in range(30))),
            ("b", " ".join(str(i) for i in range(30))),
            ("c", "too short"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac_c"])
        for r in repeated_spans(docs, window=20, stride=5).collect()
    }
    # positions 1, 6, 11 -> 3 windows each for a/b, all shared
    assert got["a"] == (3, 3, 1000000)
    assert got["b"] == (3, 3, 1000000)
    assert got["c"] == (0, 0, 0)
    with pytest.raises(ValueError, match="stride"):
        repeated_spans(docs, stride=0)


def test_scrub_pii_recovers_planted_truth(spark):
    """Counts must equal the fixture's generation-time truth columns for
    every doc, and the scrubbed text must contain no residual matches of
    any pattern."""
    from conflation_spark.operators.text import PII_PATTERNS, scrub_pii

    d = ensure_text_fixture("sf0.001")
    df = spark.read.parquet(f"{d}/pii_docs.parquet")
    s = scrub_pii(df).cache()
    bad = s.where(
        (F.col("n_emails") != F.col("true_emails"))
        | (F.col("n_ips") != F.col("true_ips"))
        | (F.col("n_phones") != F.col("true_phones"))
    ).count()
    assert bad == 0
    for _name, pat, _tok in PII_PATTERNS:
        assert s.where(F.col("scrubbed").rlike(pat)).count() == 0, pat
    # the fixture actually plants every type
    tot = s.agg(
        F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"), F.sum("n_phones").alias("p")
    ).first()
    assert tot["e"] > 0 and tot["i"] > 0 and tot["p"] > 0
    s.unpersist()


def test_scrub_pii_zero_shuffle_plan(spark):
    """The scrub is a pure map: its physical plan must contain no
    Exchange — one fused codegen stage over the scan."""
    from conflation_spark.operators.text import scrub_pii

    d = ensure_text_fixture("sf0.001")
    df = spark.read.parquet(f"{d}/pii_docs.parquet")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decontaminate_plan_broadcasts_benchmark(spark, textdocs):
    """The benchmark gram side must broadcast (eval sets are tiny); the
    corpus side must shuffle only once, on the doc id."""
    bench = textdocs.where(F.col("text_id").endswith("0"))
    corpus = textdocs.where(~F.col("text_id").endswith("0"))
    out = decontaminate(corpus, bench, "text_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
