"""BPE trainer/encoder vs hand-derived merge sequences and an
independently-written Python re-implementation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conflation_spark.operators.bpe import (
    EOW,
    bpe_encode,
    train_bpe,
    word_frequency_table,
)


def test_train_bpe_classic_example_hand_derived():
    """The Sennrich et al. running example, merges derived BY HAND:
    corpus {low:5, lower:2, newest:6, widest:3} with end-of-word marker.
    Pair counts round 1: es=9 (newest+widest), st=9, t▁=9, lo=7, ow=7,
    ne=6, ew=6, we=8(lower 2 + newest 6)... highest is es/st/t▁ at 9 —
    lexicographic tie-break picks ('e','s'). Then ('es','t') at 9, then
    ('est','▁') at 9, then lo=7/ow=7 -> ('l','o'), then ('lo','w')."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wc, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_train_bpe_stops_when_nothing_repeats():
    merges = train_bpe([("ab", 1), ("cd", 1)], 50)
    assert merges == []  # every pair occurs once; rank-1 merges are noise


def _naive_bpe_encode(word, merges):
    """Independent re-implementation: apply merges in LEARNED ORDER,
    each exhaustively (the original Sennrich formulation — equivalent to
    the kernel's rank-greedy scheme for merge tables learned by
    train_bpe on the same corpus)."""
    sym = list(word) + [EOW]
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [a + b]
            else:
                i += 1
    return sym


def test_encode_matches_independent_implementation(spark):
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wc, 5)
    docs = spark.createDataFrame(
        [("a", "low lower newest"), ("b", "widest low"), ("c", "")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for did, text in [("a", "low lower newest"), ("b", "widest low"), ("c", "")]:
        words = text.split()
        pieces = [p for w in words for p in _naive_bpe_encode(w, merges)]
        fp = int(hashlib.md5(" ".join(pieces).encode()).hexdigest()[:13], 16)
        r = got[did]
        assert (r["n_words"], r["n_pieces"], r["pieces_fp"]) == (
            len(words),
            len(pieces),
            fp,
        ), did
    # spot-check the actual segmentation via the fingerprint construction
    assert _naive_bpe_encode("lowest", merges) == ["low", "est" + EOW]


def test_encode_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "newest widest low " * (i % 5)) for i in range(40)],
        "doc_id string, text string",
    )
    merges = train_bpe([("newest", 4), ("widest", 3), ("low", 9)], 8)
    a = {r["doc_id"]: tuple(r) for r in bpe_encode(docs, merges).collect()}
    b = {r["doc_id"]: tuple(r) for r in bpe_encode(docs.repartition(11), merges).collect()}
    assert a == b


def test_kernel_tokenizer_matches_spark_normalized_on_unicode_ws(spark):
    """Word boundaries must agree between the Spark-side trainer (Java
    \\s = ASCII whitespace; NBSP is NOT a separator) and the Python
    encode kernel (a bare str.split() WOULD split on NBSP)."""
    nbsp_doc = "foo\u00a0bar baz"
    docs = spark.createDataFrame([("a", nbsp_doc)], "doc_id string, text string")
    wc = word_frequency_table(docs, max_words=10)
    assert ("foo\u00a0bar", 1) in wc and ("baz", 1) in wc
    enc = bpe_encode(docs, [], "doc_id").collect()[0]
    assert enc["n_words"] == 2  # foo\xa0bar stays ONE word, matching training


def test_word_frequency_table_deterministic_order(spark):
    docs = spark.createDataFrame(
        [("a", "zz aa zz bb aa zz"), ("b", "bb aa")], "doc_id string, text string"
    )
    wc = word_frequency_table(docs, max_words=2)
    assert wc == [("aa", 3), ("zz", 3)]  # tie at 3 -> word-asc keeps both
    with pytest.raises(ValueError, match="exceeds"):
        word_frequency_table(docs, max_words=10**9)


def test_end_to_end_corpus_roundtrip(spark):
    """Train on the text fixture, encode it, and check the global
    invariants: every doc has n_pieces >= n_words (a word is >= 1 piece),
    more merges never increase the piece count, and the piece-count sum
    strictly drops from the char-level baseline."""
    from conflation_spark.datagen_text import ensure_text_fixture

    d = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{d}/textdocs.parquet")
    wc = word_frequency_table(td, max_words=500)
    m64 = train_bpe(wc, 64)
    m256 = train_bpe(wc, 256)
    assert m64 == m256[:64]  # merge learning is prefix-stable
    e0 = bpe_encode(td, [], "text_id").agg(F.sum("n_pieces")).collect()[0][0]
    e64 = bpe_encode(td, m64, "text_id").collect()
    e256 = bpe_encode(td, m256, "text_id").agg(F.sum("n_pieces")).collect()[0][0]
    s64 = sum(r["n_pieces"] for r in e64)
    assert all(r["n_pieces"] >= r["n_words"] for r in e64)
    assert e0 > s64 >= e256
