"""Training-batch construction: chunking vs a Python oracle; packing vs a
single-threaded global-cumsum oracle + partitioning invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conflation_spark.datagen_text import ensure_text_fixture
from conflation_spark.operators.packing import chunk_documents, pack_sequences


def test_chunking_matches_python_oracle(spark):
    td = spark.read.parquet(f"{ensure_text_fixture('sf0.001')}/textdocs.parquet")
    window, overlap, stride = 32, 8, 24
    got = {}
    for r in chunk_documents(td, "text_id", "text", window, overlap).collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["chunk_tokens"])
        )
    for r in td.collect():
        toks = r["text"].split()
        if len(toks) <= window:
            want = [toks]
        else:
            n_chunks = 1 + int(np.ceil((len(toks) - window) / stride))
            want = [toks[i * stride : i * stride + window] for i in range(n_chunks)]
        g = sorted(got[r["text_id"]])
        assert len(g) == len(want), r["text_id"]
        for (ci, ctext, ctok), w in zip(g, want):
            assert ctext == " ".join(w)
            assert ctok == len(w)
    # every non-final chunk holds exactly `window` tokens; consecutive
    # chunks overlap by exactly `overlap`
    multi = {k: v for k, v in got.items() if len(v) > 1}
    assert multi
    for chunks in multi.values():
        chunks = sorted(chunks)
        for ci, ctext, ctok in chunks[:-1]:
            assert ctok == window
        for (_, a, _), (_, b_, _) in zip(chunks, chunks[1:]):
            assert a.split()[stride:] == b_.split()[: window - stride]


def test_chunking_rejects_bad_overlap(spark):
    td = spark.createDataFrame([("a", "x y z")], "text_id string, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(td, window=8, overlap=8)


def _pack_oracle(rows, target):
    """Single-threaded global offset packing in id order."""
    out = {}
    pos = 0
    for rid, n in sorted(rows):
        b = pos // target
        out[rid] = (b, pos - b * target, n > 0 and (pos + n - 1) // target > b)
        pos += n
    return out


def test_pack_sequences_matches_global_oracle(spark):
    rng = np.random.default_rng(9)
    rows = [(f"d{i:05d}", int(rng.integers(1, 300))) for i in range(500)]
    df = spark.createDataFrame(rows, "text_id string, n_tokens long")
    got = {
        r["text_id"]: (r["bin"], r["bin_offset"], r["straddle"])
        for r in pack_sequences(df, 512).collect()
    }
    assert got == _pack_oracle(rows, 512)
    # partitioning invariance: a different physical layout, same answer
    got2 = {
        r["text_id"]: (r["bin"], r["bin_offset"], r["straddle"])
        for r in pack_sequences(df.repartition(13), 512).collect()
    }
    assert got2 == got


def test_pack_sequences_no_single_task_window(spark):
    """The scale property: the cumsum window is partitioned by the bucket
    column — the plan must contain NO unpartitioned (global) Window sort
    (Spark's single-task trap)."""
    df = spark.createDataFrame(
        [(f"d{i:05d}", 10) for i in range(100)], "text_id string, n_tokens long"
    )
    plan = pack_sequences(df, 64)._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan carries a partition spec (no 'Window [..],
    # [sort..]' without 'partitionBy' -> in physical text: the window's
    # partition expressions list is non-empty, i.e. no "Window [" with an
    # empty partition clause. Physical form: Window [exprs], [partexprs], [sortexprs]
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\], \[[^\]]*\]", plan):
        assert m.group(1).strip(), plan  # partition spec non-empty


def test_pack_sequences_bucket_cap(spark):
    df = spark.createDataFrame(
        [(f"d{i:04d}", 1) for i in range(50)], "text_id string, n_tokens long"
    )
    with pytest.raises(ValueError, match="buckets"):
        pack_sequences(df, 8, bucket=F.col("text_id"), max_buckets=10)


def test_pack_sequences_rejects_numeric_ids_with_default_bucket(spark):
    """The default bucket (string prefix) sorts lexicographically while
    numeric ids sort numerically ('10' < '2') — silently wrong packing;
    the operator must refuse and demand an order-aligned bucket."""
    df = spark.createDataFrame([(2, 100), (10, 100)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="order-aligned"):
        pack_sequences(df, 512, id_col="doc_id")
    # an explicit order-aligned bucket works (zero-padded numeric)
    out = pack_sequences(
        df, 512, id_col="doc_id",
        bucket=F.lpad(F.col("doc_id").cast("string"), 6, "0"),
    )
    got = {r["doc_id"]: (r["bin"], r["bin_offset"]) for r in out.collect()}
    assert got == {2: (0, 0), 10: (0, 100)}


def test_pack_sequences_rejects_numeric_explicit_bucket(spark):
    """An explicitly passed NUMERIC bucket would be silently misordered
    after the string cast ('10' < '2') — refused with guidance."""
    df = spark.createDataFrame(
        [(f"d{i:05d}", 10) for i in range(20)], "text_id string, n_tokens long"
    )
    with pytest.raises(ValueError, match="order-aligned STRING"):
        pack_sequences(df, 64, bucket=F.floor(F.lit(3) + F.col("n_tokens")))
