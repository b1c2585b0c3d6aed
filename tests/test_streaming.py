"""Structured Streaming: stateless trace-accept equals the batch operator;
watermarked windowed counts equal the batch aggregation."""

import os
import shutil

from pyspark.sql import functions as F

from conflation_spark.operators.trace_filter import accepted_doc_ids
from conflation_spark.sources.spans import decode_points, load_documents
from conflation_spark.streaming.ingest import (
    doc_accept_stateless,
    stream_events,
    streaming_trace_accept,
    windowed_event_counts,
)


def _await_done(q, seconds):
    """awaitTermination returns False on timeout WITHOUT raising — a
    partially-filled memory sink then fails the equality assert with a
    misleading diff. Fail loudly, with slack for loaded CI hosts."""
    assert q.awaitTermination(3 * seconds), "streaming query did not terminate"


def test_stateless_accept_equals_batch(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    got = {
        r["doc_id"] for r in doc_accept_stateless(docs).where("accept").collect()
    }
    want = {r["doc_id"] for r in accepted_doc_ids(decode_points(docs)).collect()}
    assert got == want


def test_streaming_trace_accept_available_now(spark, fixture_dir, tmp_path):
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    shutil.copy(f"{fixture_dir}/documents.parquet", f"{src}/part0.parquet")
    out = streaming_trace_accept(spark, src)
    q = (
        out.writeStream.format("memory")
        .queryName("accepts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 120)
    got = {
        r["doc_id"]
        for r in spark.sql("select doc_id from accepts where accept").collect()
    }
    docs = load_documents(spark, fixture_dir)
    want = {r["doc_id"] for r in accepted_doc_ids(decode_points(docs)).collect()}
    assert got == want


def test_windowed_event_counts_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.repartition(3).write.parquet(src)

    streamed = stream_events(spark, src, window="1 minute")
    q = (
        streamed.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from wincounts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    # append-mode stream emits only windows sealed by the watermark; every
    # emitted window must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v
    # and the max event time seals all but the trailing watermark's windows
    assert len(got) >= len(want) - 3


def test_stateful_user_totals_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state persists across trigger cycles; the
    final running totals equal the batch aggregation."""
    from conflation_spark.streaming.ingest import stateful_user_totals

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_state")
    events.repartition(3).write.parquet(src)

    out = stateful_user_totals(spark, src, max_files_per_trigger=1)
    q = (
        out.writeStream.format("memory")
        .queryName("usertotals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 180)
    rows = spark.sql("select * from usertotals").collect()
    assert rows
    # multiple microbatches actually happened (state was exercised)
    per_user_rows = {}
    final_totals = {}
    for r in rows:
        per_user_rows.setdefault(r["user_id"], []).append(r)
        cur = final_totals.get(r["user_id"], (0, 0.0))
        if r["total_events"] > cur[0]:
            final_totals[r["user_id"]] = (r["total_events"], r["total_value"])
    assert any(len(v) > 1 for v in per_user_rows.values())
    want = {
        r["user_id"]: (r["n"], round(r["v"], 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    got = {u: (n, v) for u, (n, v) in final_totals.items()}
    assert got == want
    # running totals = sum of batch contributions
    for u, rs in per_user_rows.items():
        assert sum(r["batch_events"] for r in rs) == final_totals[u][0]


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """Digest state persists across microbatches: a duplicate arriving in a
    LATER file (forced by maxFilesPerTrigger=1) is dropped; kept texts
    equal the batch distinct set."""
    from conflation_spark.streaming.ingest import streaming_exact_dedup

    src = str(tmp_path / "texts_stream")
    os.makedirs(src)
    batch1 = [("a1", "alpha beta gamma"), ("a2", "delta epsilon"), ("a3", "  ALPHA   BETA GAMMA ")]
    batch2 = [("b1", "alpha beta gamma"), ("b2", "zeta eta"), ("b3", "delta epsilon")]
    schema = "text_id string, text string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(f"{src}/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 120)
    rows = spark.sql("select text_id, text from dedup_stream").collect()
    import re

    kept_norm = {re.sub(r"\s+", " ", r["text"].strip().lower()) for r in rows}
    assert kept_norm == {"alpha beta gamma", "delta epsilon", "zeta eta"}
    assert len(rows) == 3  # one winner per digest, across batches AND casing


def test_session_window_stream_equals_batch(spark, tmp_path):
    """Native session windows: the streaming run (availableNow, append
    mode) must emit exactly the batch session_window result for every
    watermark-sealed session, and sessions must match the lag-window
    sessionization's per-user session count."""
    from conflation_spark.streaming.ingest import (
        session_window_counts,
        stream_event_sessions,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_sess_stream")
    events.repartition(3).write.parquet(src)

    q = (
        stream_event_sessions(spark, src, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sesscounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 120)
    got = {
        (r["user_id"], r["sess_start"]): (r["sess_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sesscounts").collect()
    }
    batch = session_window_counts(events, gap="30 minutes").collect()
    want = {
        (r["user_id"], r["sess_start"]): (r["sess_end"], r["n_events"], r["sum_value"])
        for r in batch
    }
    assert got
    for k, v in got.items():
        assert want[k] == v
    # gap semantics parity with the batch lag-window sessionization: same
    # number of sessions per user (30-min gap both ways)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    te = F.col("ts").cast("timestamp").cast("double")
    gap = te - F.lag(te).over(w)
    lag_sessions = (
        events.withColumn("new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new").alias("n_sessions"))
    )
    lag_counts = {r["user_id"]: r["n_sessions"] for r in lag_sessions.collect()}
    sess_counts: dict = {}
    for r in batch:
        sess_counts[r["user_id"]] = sess_counts.get(r["user_id"], 0) + 1
    assert sess_counts == lag_counts


def _signup_windows(events):
    """Per-user validity windows from signup events: [ts, ts + 6 days]."""
    return (
        events.where(F.col("event_type") == "signup")
        .selectExpr(
            "user_id",
            "ts as start",
            "ts + INTERVAL 6 DAYS as end",
            "event_id as win_id",
        )
    )


def test_interval_enrich_batch_equals_range_join(spark):
    """The stream-stream builder run in BATCH mode (watermark is a no-op,
    the time-range clauses are plain predicates) must equal the batch
    range_join_bucketed on the same data — the documented batch twin."""
    from conflation_spark.operators.temporal import range_join_bucketed
    from conflation_spark.streaming.ingest import interval_enrich

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    wins = _signup_windows(events)
    got = {
        (r["event_id"], r["rj_win_id"])
        for r in interval_enrich(
            events, wins, ["user_id"], "ts", "start", "end", max_duration="7 days"
        ).collect()
    }
    # TIMESTAMP_NTZ needs the two-step cast (CLAUDE.md rule 7)
    tsec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    lsec = events.withColumn("tsec", tsec("ts"))
    rsec = wins.select(
        "user_id",
        tsec("start").alias("start"),
        tsec("end").alias("end"),
        "win_id",
    )
    want = {
        (r["event_id"], r["rj_win_id"])
        for r in range_join_bucketed(
            lsec, rsec, ["user_id"], "tsec", "start", "end",
            bucket_width=86400.0, right_cols=["win_id"],
        ).collect()
    }
    assert got and got == want


def test_stream_stream_interval_join_available_now(spark, tmp_path):
    """Watermarked stream-stream interval join: two parquet streams
    (events, windows) joined with the event-time range condition; the
    availableNow run must emit exactly the batch-mode matches."""
    from conflation_spark.streaming.ingest import interval_enrich, stream_interval_enrich

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    wins = _signup_windows(events)
    ev_dir = str(tmp_path / "ss_events")
    win_dir = str(tmp_path / "ss_windows")
    events.repartition(3).write.parquet(ev_dir)
    wins.coalesce(1).write.parquet(win_dir)

    out = stream_interval_enrich(spark, ev_dir, win_dir, max_duration="7 days")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ss_interval")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 180)
    got = {
        (r["event_id"], r["rj_win_id"])
        for r in spark.sql("select event_id, rj_win_id from ss_interval").collect()
    }
    want = {
        (r["event_id"], r["rj_win_id"])
        for r in interval_enrich(
            events, wins, ["user_id"], "ts", "start", "end", max_duration="7 days"
        ).collect()
    }
    assert got and got == want


def test_streaming_kmv_equals_batch_sketch(spark, tmp_path):
    """Bounded-state streaming distinct count: the bottom-k hash state
    survives microbatches (forced by maxFilesPerTrigger=1) and the final
    per-group estimate equals the batch kmv_sketch over the same rows —
    identical sketch, identical estimator arithmetic."""
    from conflation_spark.operators.sketch import kmv_sketch
    from conflation_spark.streaming.ingest import streaming_kmv_distinct

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_kmv")
    events.repartition(4).write.parquet(src)

    out = streaming_kmv_distinct(spark, src, k=8)  # small k -> estimator branch
    q = (
        out.writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 180)
    rows = spark.sql("select * from kmv_stream").collect()
    assert rows
    finals: dict = {}
    per_group_rows: dict = {}
    for r in rows:
        per_group_rows.setdefault(r["group_key"], []).append(r)
        cur = finals.get(r["group_key"], (0, 0))
        cand = (r["n_retained"], r["est_distinct"])
        if cand > cur:
            finals[r["group_key"]] = cand
    # multiple microbatches actually exercised the state
    assert any(len(v) > 1 for v in per_group_rows.values())
    want = {
        r["event_type"]: (r["n_retained"], r["est_distinct"])
        for r in kmv_sketch(events, "user_id", k=8, group_cols=["event_type"]).collect()
    }
    assert finals == want
    # the estimator branch (not the exact under-full branch) was hit
    assert any(n == 8 for n, _ in finals.values())


def test_stateless_bands_equal_batch_bands(spark):
    """The per-row (streaming-safe) minhash banding must produce the
    IDENTICAL (id, band_idx, band_hash) rows as the batch explode+agg
    form — same hash family, same packing."""
    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.operators.dedup import _minhash_banded
    from conflation_spark.streaming.ingest import stateless_minhash_bands

    td = spark.read.parquet(f"{ensure_text_fixture('sf0.001')}/textdocs.parquet")
    got = {
        (r["id"], r["band_idx"], r["band_hash"])
        for r in stateless_minhash_bands(td, "text_id", "text").collect()
    }
    want = {
        (r["id"], r["band_idx"], r["band_hash"])
        for r in _minhash_banded(td, "text_id", "text", 64, 16, 3).collect()
    }
    assert got == want and got


def test_streaming_minhash_pairs_equals_batch(spark, tmp_path):
    """Streaming near-dup detection: bucket membership persists across
    microbatches (a near-dup arriving in a LATER file still pairs with
    the original) and the deduped pair set equals batch
    minhash_lsh_pairs when no bucket saturates."""
    from pyspark.sql import functions as FF

    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.operators.dedup import minhash_lsh_pairs
    from conflation_spark.streaming.ingest import streaming_minhash_pairs

    td = (
        spark.read.parquet(f"{ensure_text_fixture('sf0.001')}/textdocs.parquet")
        .where(FF.col("text_id") < "t000120")
        .select("text_id", "text")
    )
    src = str(tmp_path / "mh_stream")
    import os as _os

    _os.makedirs(src)
    # split so known near-dup sources and their dups land in separate
    # files -> separate microbatches (ids are roughly chronological and
    # dups reference earlier docs)
    td.where(FF.col("text_id") < "t000060").coalesce(1).write.parquet(f"{src}/f1")
    td.where(FF.col("text_id") >= "t000060").coalesce(1).write.parquet(f"{src}/f2")

    out = streaming_minhash_pairs(spark, f"{src}/*", max_files_per_trigger=1)
    q = (
        out.writeStream.format("memory")
        .queryName("mh_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 240)
    rows = spark.sql("select * from mh_pairs").collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(td, "text_id", "text").collect()
    }
    assert got == want and got
    # cross-microbatch pairing actually happened: some pair spans the file
    # split (earlier id < t000060 <= later id)
    assert any(a < "t000060" <= b for a, b in got)


def test_streaming_quality_scores_equal_batch(spark, tmp_path):
    """Ingest-time quality gate: the stream over the textdocs fixture
    produces exactly the batch quality_classifier rows."""
    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.operators.lm import quality_classifier
    from conflation_spark.streaming.ingest import streaming_quality_scores

    d = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{d}/textdocs.parquet")
    src = str(tmp_path / "textdocs_stream")
    td.select("text_id", "text").repartition(3).write.parquet(src)

    out = streaming_quality_scores(spark, src, n_buckets=512)
    q = (
        out.writeStream.format("memory")
        .queryName("qscores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q, 120)
    got = {tuple(r) for r in spark.sql("select * from qscores").collect()}
    want = {
        tuple(r)
        for r in quality_classifier(td, "text_id", "text", n_buckets=512).collect()
    }
    assert got == want
