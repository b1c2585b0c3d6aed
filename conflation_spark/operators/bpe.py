"""Distributed BPE tokenizer training + encoding.

Real subword tokenizers (GPT-2 BPE, SentencePiece) are trained on a
WORD-FREQUENCY table, not the raw corpus: pre-tokenize to words, count
them (one distributed pass), then run the merge loop on the bounded
(word, count) table — each merge is O(vocab) instead of O(corpus). That
factoring is what makes tokenizer training feasible at the 100 TB tier,
and it is the shape implemented here: Spark produces the frequency
table, the merge loop runs driver-side on a contract-bounded collect
(the `similarity.py` centroid convention), and the learned merge ranks
ship back into a distributed `mapInPandas` encode kernel.

The reference repo has no tokenizer (`text.py`'s `n_bpe_pieces` is a
regex PROXY for counting, `operators/text.py:29`); this is the real
mechanism. Algorithm: classic character-BPE (Sennrich et al. 2016) over
whitespace words with an end-of-word marker, greedy rank-ordered merge
application at encode time (the GPT-2 tokenizer's scheme). Deterministic
end-to-end: merge selection ties break on (count desc, pair lexicographic),
so the same corpus always learns the same tokenizer at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word marker (the SentencePiece block char)
MAX_TRAIN_WORDS = 1_000_000  # driver-collect bound for the merge loop


def word_frequency_table(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 65_536,
) -> list[tuple[str, int]]:
    """(word, count) pairs for the ``max_words`` most frequent normalized
    whitespace words — the shared `lm.unigram_vocab` subplan (ONE
    distributed explode + hash aggregation + TakeOrdered with the
    deterministic (count desc, word asc) tie-break), collected under a
    fail-fast bound. Truncating to the top words is the standard practice
    (the tail carries negligible mass and would otherwise make the merge
    loop O(type count))."""
    from conflation_spark.operators.lm import unigram_vocab

    if max_words > MAX_TRAIN_WORDS:
        raise ValueError(
            f"max_words={max_words} exceeds the driver bound {MAX_TRAIN_WORDS}"
        )
    cnt = unigram_vocab(df, text_col, max_words)
    return [(r["tok"], r["c"]) for r in cnt.collect()]


def train_bpe(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) table.

    Each word starts as its characters plus the end-of-word marker; every
    round counts adjacent symbol pairs weighted by word frequency, merges
    the most frequent pair (ties: count desc, pair lexicographic — fully
    deterministic), and rewrites the affected words. Stops early when no
    pair repeats. Pure driver-side Python over the bounded table —
    O(n_merges * vocab), the SentencePiece cost model."""
    vocab = {tuple(w) + (EOW,): c for w, c in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats; further merges are noise
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        out = {}
        for sym, c in vocab.items():
            i, ns = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + c
        vocab = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-ordered merge application (the GPT-2 scheme): always
    merge the lowest-rank adjacent pair present until none applies."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with a learned merge table: output
    (id_col, n_words, n_pieces, pieces_fp) where pieces_fp is the 52-bit
    md5 prefix of the space-joined piece sequence (a cross-run
    fingerprint — two encoders agree iff every piece boundary agrees).

    Plan: ONE mapInPandas pass; the merge-rank dict is closure-broadcast
    (tokenizers are a few thousand merges — broadcast-sized by
    construction) and each batch memoizes per distinct word, so the
    kernel cost scales with distinct words per batch, not tokens.

    Tokenizer parity: word boundaries must match the Spark-side
    `normalized` tokenizer the trainer used (Java ``\\s`` = ASCII
    whitespace only), so the kernel uses an ASCII-flagged regex — a bare
    ``str.split()`` splits on UNICODE whitespace (NBSP etc.) and would
    segment words the trainer never saw."""
    import hashlib
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)  # Java \s: [ \t\n\x0B\f\r]
    ranks = {p: i for i, p in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()

    def op(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids, n_words, n_pieces, fps = [], [], [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                norm = ws.sub(" ", (text or "").lower()).strip(" \t\n\x0b\f\r")
                words = [w for w in norm.split(" ") if w]
                pieces: list[str] = []
                for w in words:
                    if w not in memo:
                        memo[w] = _encode_word(w, ranks)
                    pieces.extend(memo[w])
                ids.append(did)
                n_words.append(len(words))
                n_pieces.append(len(pieces))
                fp = hashlib.md5(" ".join(pieces).encode()).hexdigest()[:13]
                fps.append(int(fp, 16))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_words": pd.array(n_words, dtype="int64"),
                    "n_pieces": pd.array(n_pieces, dtype="int64"),
                    "pieces_fp": pd.array(fps, dtype="int64"),
                }
            )

    out = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(
        op, schema=f"id {id_type}, n_words long, n_pieces long, pieces_fp long"
    )
    return out.select(
        F.col("id").alias(id_col), "n_words", "n_pieces", "pieces_fp"
    )
