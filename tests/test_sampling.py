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
