"""Deterministic sampling: partitioning invariance (the property that
distinguishes it from df.sample), python-md5 oracle parity, fraction
accuracy, salt independence, stratified quotas."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conflation_spark.operators.sampling import (
    _thr_hex,
    deterministic_sample,
    sample_predicate,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string").cache()


def _py_keep(key, fraction, salt="", digits=8):
    h = hashlib.md5((str(key) + salt).encode()).hexdigest()[:digits]
    return h < _thr_hex(fraction, digits)


def test_matches_python_md5_oracle(spark, docs):
    got = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    want = {i for i in range(3000) if _py_keep(i, 0.3)}
    assert got == want
    # fraction lands near target (binomial, 3000 draws)
    assert 0.25 < len(got) / 3000 < 0.35


def test_partitioning_invariance(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.2).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17, "lang"), 0.2).collect()
    }
    assert a == b  # df.sample() fails exactly this


def test_salt_gives_independent_draws(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.5, salt="s1").collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.5, salt="s2").collect()}
    assert a != b
    overlap = len(a & b) / 3000
    assert 0.15 < overlap < 0.35  # ~0.25 if independent


def test_edge_fractions(spark, docs):
    assert deterministic_sample(docs, 1.0).count() == 3000  # 'g' sentinel
    assert deterministic_sample(docs, 0.0).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        _thr_hex(1.5, 8)


def test_stratified_quotas(spark, docs):
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.5, "zh": 0.0}, stratum_col="lang"
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang.get("en") == 1000
    assert "zh" not in by_lang
    assert 400 < by_lang.get("de", 0) < 600
    # per-stratum membership equals the single-stratum predicate
    de_only = {r["doc_id"] for r in out.where("lang = 'de'").collect()}
    want = {
        r["doc_id"]
        for r in docs.where("lang = 'de'")
        .where(sample_predicate(F.col("doc_id"), 0.5))
        .collect()
    }
    assert de_only == want


def test_weighted_sample_matches_python_and_prefers_heavy(spark):
    """A-ES weighted sampling: matches the pure-Python ranking exactly,
    excludes non-positive weights, and inclusion tracks weight."""
    import math

    from conflation_spark.operators.sampling import weighted_sample_topk

    rows = [(i, "s", (i % 7 == 0) * 900 + 10) for i in range(500)]
    rows.append((998, "s", 0))  # weight 0: excluded
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = weighted_sample_topk(df, k=50, weight_col="w", stratum_col="lang")
    got = [(r["doc_id"], r["sample_rank"]) for r in out.orderBy("sample_rank").collect()]

    def skey(i, w):
        hv = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        return math.log((hv + 1) / 4503599627370496.0) / w

    ranked = sorted(
        ((i, w) for i, s, w in rows if w > 0),
        key=lambda t: (-skey(t[0], t[1]), t[0]),
    )
    want = [(i, r + 1) for r, (i, w) in enumerate(ranked[:50])]
    assert got == want
    # heavy rows (w=910, ~14% of population) dominate the sample
    heavy = sum(1 for i, _ in got if i % 7 == 0)
    assert heavy > 35
    assert all(i != 998 for i, _ in got)
    # global (no stratum) path: TakeOrdered plan, same top-10 set
    g = weighted_sample_topk(df, k=10, weight_col="w")
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    assert {r["doc_id"] for r in g.collect()} == {i for i, _ in want[:10]}
