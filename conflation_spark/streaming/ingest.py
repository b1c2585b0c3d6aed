"""Structured Streaming ingestion.

Two streaming operators:

1. ``streaming_trace_accept`` — the trace-quality filter (reference F1-F9)
   reformulated STATELESS for streams: a document arrives whole (one row =
   one doc with its spans array), so every per-doc aggregate becomes an
   array expression (aggregate/transform/filter over the sorted gps spans)
   instead of an explode + window + groupBy. Zero shuffle, zero state —
   it runs identically under readStream and batch (tested for equality
   against the batch operator).

2. ``windowed_event_counts`` — watermarked tumbling-window aggregation over
   an event stream (the engine's generic streaming-rollup primitive).

Both are driven by file sources + ``Trigger.AvailableNow`` in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conflation_spark.operators.trace_filter import (
    MAXIMUM_POOR_MEASUREMENTS_PERCENT,
    MAXIMUM_SPEED_BETWEEN_ADJACENT_POINTS,
    MAXIMUM_TIME_BETWEEN_ADJACENT_POINTS,
    MINIMUM_MEAN_SPEED,
    MINIMUM_TOTAL_DISTANCE,
    MINIMUM_TOTAL_TIME,
)
from conflation_spark.sources.spans import GPS_JSON_SCHEMA


def _hav_m(lon1, lat1, lon2, lat2) -> Column:
    a = F.pow(F.sin((F.radians(lat2) - F.radians(lat1)) / 2), 2) + F.cos(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.pow(F.sin((F.radians(lon2) - F.radians(lon1)) / 2), 2)
    return F.asin(F.sqrt(a)) * F.lit(2.0 * 6378160.0)


def doc_accept_stateless(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, n_points, accept) without explode/shuffle.

    Same accept semantics as operators.trace_filter (see its docstring for
    the reference citations); pair deltas come from zipping the gps-point
    array with itself shifted by one.
    """
    pts = F.transform(
        F.array_sort(
            F.filter(F.col("spans"), lambda s: s["kind"] == "gps"),
            lambda a, b: F.when(a["offset"] < b["offset"], -1)
            .when(a["offset"] > b["offset"], 1)
            .otherwise(0),
        ),
        lambda s: F.from_json(s["text"], GPS_JSON_SCHEMA),
    )
    n = F.size(pts)
    pairs = F.when(
        n >= 2,
        F.zip_with(F.slice(pts, 1, n - 1), F.slice(pts, 2, n - 1), lambda a, b:
            F.struct(
                (b["time"] - a["time"]).alias("dt"),
                _hav_m(a["lon"], a["lat"], b["lon"], b["lat"]).alias("d"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<dt:double,d:double>>"))
    nz = F.filter(pairs, lambda p: p["dt"] != 0)
    total_time = F.when(n >= 1, pts[n - 1]["time"] - pts[0]["time"]).otherwise(F.lit(0.0))
    total_dist = F.aggregate(nz, F.lit(0.0), lambda acc, p: acc + p["d"])
    has_neg = F.exists(pairs, lambda p: p["dt"] < 0)
    v = lambda p: p["d"] / 1000.0 / p["dt"] * 3600.0  # noqa: E731
    num_poor = F.aggregate(
        pairs,
        F.lit(0),
        lambda acc, p: acc
        + F.when(p["dt"] > MAXIMUM_TIME_BETWEEN_ADJACENT_POINTS, 1).otherwise(0)
        + F.when((p["dt"] != 0) & (v(p) > MAXIMUM_SPEED_BETWEEN_ADJACENT_POINTS), 1).otherwise(0),
    )
    n_speeds = F.size(nz)
    mean_speed = F.when(
        n_speeds > 0, F.aggregate(nz, F.lit(0.0), lambda acc, p: acc + v(p)) / n_speeds
    )
    accept = (
        (n > 0)
        & (total_time >= MINIMUM_TOTAL_TIME)
        & ~has_neg
        & (num_poor / n <= MAXIMUM_POOR_MEASUREMENTS_PERCENT)
        & (total_dist >= MINIMUM_TOTAL_DISTANCE)
        & (mean_speed.isNull() | (mean_speed >= MINIMUM_MEAN_SPEED))
    )
    return documents.select(
        "doc_id",
        n.cast("long").alias("n_points"),
        accept.alias("accept"),
    )


def streaming_trace_accept(spark, input_dir: str) -> DataFrame:
    """readStream over a documents directory -> per-doc accept decisions."""
    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return doc_accept_stateless(stream)


def streaming_quality_scores(spark, input_dir: str, n_buckets: int = 4096) -> DataFrame:
    """readStream over a textdocs directory -> per-doc fastText-style
    quality scores, via the stateless per-row kernel
    (`operators.lm.quality_scores_stateless`) — an ingest-time quality
    gate: zero shuffle, zero state, output EXACTLY equal to the batch
    `quality_classifier` plan (integer feature sums; parity tested)."""
    from conflation_spark.operators.lm import quality_scores_stateless

    schema = "text_id string, text string"
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return quality_scores_stateless(stream, "text_id", "text", n_buckets=n_buckets)


def windowed_event_counts(
    events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts + value sums per event_type.

    Late rows beyond the watermark are dropped; state is bounded by
    (watermark / window) x |event_type| — safe for unbounded streams.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events(spark, input_dir: str, window: str = "1 minute") -> DataFrame:
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return windowed_event_counts(stream, window)


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-based, data-driven extent) per user:
    Spark's ``session_window`` merges rows whose gaps stay under ``gap``
    and closes a session once the watermark passes its end — the
    streaming twin of the batch lag-window sessionization
    (`event_sessions`). State is one open session per active user,
    watermark-bounded; works identically on a batch DataFrame (the
    equality test runs both)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_event_sessions(spark, input_dir: str, gap: str = "30 minutes") -> DataFrame:
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return session_window_counts(stream, gap)


def interval_enrich(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    max_duration: str = "7 days",
    watermark: str = "1 hour",
    right_cols: list[str] | None = None,
    prefix: str = "rj_",
) -> DataFrame:
    """Stream-stream interval join: each left event row joins every right
    interval [start, end] (TIMESTAMP columns, inclusive) covering it, per
    key — the streaming twin of the batch ``range_join_bucketed``
    (operators/temporal.py), and the one streaming shape a real event
    pipeline needs that windows/sessions/dedup don't cover.

    State bounding is the whole design: Spark only bounds stream-stream
    join state when the condition carries an explicit event-time range
    between the two streams, so the join clause is

        l.ts >= r.start AND l.ts <= r.start + max_duration   (state bound)
        AND l.ts <= r.end                                    (exact residual)

    with watermarks on BOTH sides. ``max_duration`` is the caller's
    contract on the longest interval (the analog of the batch operator's
    ``max_buckets_per_interval``): intervals longer than it are silently
    truncated at the bound, so size it to the real maximum. Rows later
    than ``watermark`` are dropped; state per key is |right rows younger
    than watermark + max_duration| + |left rows younger than watermark|.

    Works identically on BATCH frames (withWatermark is a no-op there and
    the time-range clauses are plain predicates) — the parity tests and
    the DuckDB oracle run exactly this builder in batch mode.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(key_cols) | {start_col, end_col}
    ]
    out_names = [
        f"{prefix}{start_col}",
        f"{prefix}{end_col}",
        *[f"{prefix}{c}" for c in right_cols],
    ]
    clash = sorted(set(out_names) & set(left.columns))
    if clash:
        raise ValueError(
            f"interval_enrich output column(s) {clash} collide with left "
            f"columns; pass a different prefix (got {prefix!r})"
        )
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"interval_enrich would emit duplicate output column(s) {dupes}; "
            "drop the duplicate from right_cols"
        )
    rk_clash = sorted({f"_rk_{k}" for k in key_cols} & set(left.columns))
    if rk_clash:
        raise ValueError(
            f"interval_enrich's internal key alias(es) {rk_clash} collide "
            "with left columns; rename those left columns"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(start_col, watermark).select(
        *[F.col(k).alias(f"_rk_{k}") for k in key_cols],
        F.col(start_col).alias(f"{prefix}{start_col}"),
        F.col(end_col).alias(f"{prefix}{end_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    ps, pe = f"{prefix}{start_col}", f"{prefix}{end_col}"
    cond = (
        (F.col(left_ts) >= F.col(ps))
        & (F.col(left_ts) <= F.col(ps) + F.expr(f"INTERVAL {max_duration}"))
        & (F.col(left_ts) <= F.col(pe))
    )
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    if not left.isStreaming and not right.isStreaming:
        # batch twin only (a streaming run plans its own symmetric hash
        # join): without the hint the planner has been observed
        # BROADCASTING the full left/events side off a bad estimate;
        # shuffled-hash on the key with the interval side as build keeps
        # the big side streaming (guide §3.1)
        r = r.hint("shuffle_hash")
    return l.join(r, cond, "inner").drop(*[f"_rk_{k}" for k in key_cols])


def stream_interval_enrich(
    spark,
    events_dir: str,
    windows_dir: str,
    key_cols: list[str] | None = None,
    max_duration: str = "7 days",
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream wiring for ``interval_enrich`` over two parquet event
    directories (events: the standard event schema; windows:
    (user_id, start, end, win_id))."""
    ev_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    win_schema = "user_id long, start timestamp, end timestamp, win_id long"
    ev = spark.readStream.schema(ev_schema).parquet(events_dir)
    win = spark.readStream.schema(win_schema).parquet(windows_dir)
    return interval_enrich(
        ev, win, key_cols or ["user_id"], "ts", "start", "end",
        max_duration=max_duration, watermark=watermark,
    )


def streaming_exact_dedup(
    documents: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on the normalized-text digest (the streaming
    twin of ``operators.dedup.exact_dedup``).

    The digest state persists ACROSS microbatches, so a duplicate arriving
    hours after the original is still dropped. Winner semantics differ from
    batch by necessity: streaming keeps the FIRST-ARRIVED row per digest
    (batch keeps min id — a full-history sort is not expressible on an
    unbounded stream).

    With ``ts_col`` the state is bounded via
    ``dropDuplicatesWithinWatermark`` (duplicates further apart than the
    watermark can reappear — the standard tradeoff); without it the digest
    set grows with the number of DISTINCT documents (exact forever, size
    it accordingly).
    """
    from conflation_spark.operators.dedup import normalized

    h = documents.withColumn("_md5", F.md5(normalized(F.col(text_col))))
    if ts_col is not None:
        out = h.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["_md5"])
    else:
        out = h.dropDuplicates(["_md5"])
    return out.drop("_md5")


def stateless_minhash_bands(
    df: DataFrame,
    id_col: str = "text_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-row (stateless) banded minhash — the streaming-safe twin of
    ``dedup._minhash_banded``: identical hash family (same a/b constants,
    same xxhash64 base, same band packing), so its band hashes are
    comparable with the batch operator's and with band checkpoints.

    The batch form explodes shingles and aggregates (a shuffle a stream
    can't do per-doc); here the signature is an array expression over the
    row's own shingles. Cost note (CLAUDE.md rule 2): the n_hashes min
    expressions each reference the base-hash array, so an exchange
    barrier sits BETWEEN the base-hash projection and the min consumers
    (``repartition(id)``) — the shingle hashing runs once per row and
    crosses the shuffle as data instead of re-running n_hashes times.
    Output: (id, band_idx, band_hash), one row per (doc, band)."""
    import numpy as np

    from conflation_spark.operators.dedup import MERSENNE, word_shingles

    rng = np.random.default_rng(42)  # the batch family's seed
    a = rng.integers(1, MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=n_hashes, dtype=np.int64)
    hs = F.transform(
        word_shingles(F.col(text_col), shingle_k),
        lambda g: F.pmod(F.xxhash64(g), F.lit(MERSENNE)),
    )
    base = df.select(F.col(id_col).alias("id"), hs.alias("_hs")).repartition("id")

    # closure-bind the constants: a 2-param transform lambda would receive
    # the ELEMENT INDEX as its second argument (same trap as CLAUDE.md
    # rule 6 for applyInPandas kernels)
    def _mh(ai: int, bi: int):
        return F.array_min(
            F.transform(
                F.col("_hs"),
                lambda h: F.pmod(
                    F.pmod(F.lit(ai) * h, F.lit(MERSENNE)) + F.lit(bi),
                    F.lit(MERSENNE),
                ),
            )
        )

    mh = [_mh(int(a[i]), int(b[i])).alias(f"mh{i}") for i in range(n_hashes)]
    sig = base.select("id", *mh)
    # the band packing is THE shared definition from dedup.py — streaming
    # and batch band hashes must stay byte-comparable (checkpoints,
    # parity tests), so there is exactly one copy of it
    from conflation_spark.operators.dedup import band_hash_structs

    band_structs = band_hash_structs(bands, n_hashes // bands)
    return sig.select("id", F.explode(F.array(*band_structs)).alias("b")).select(
        "id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )


def streaming_minhash_pairs(
    spark,
    input_dir: str,
    id_col: str = "text_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int = 200,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """STREAMING near-dup candidate detection: as documents arrive, each
    is banded (stateless minhash, same family as batch) and checked
    against every band bucket it lands in; the bucket's membership is
    `applyInPandasWithState` state, so a near-duplicate arriving HOURS
    after the original still pairs with it.

    Emits (id_a, id_b, band_idx) candidate rows — the same pair can
    surface from several bands (batch runs a `distinct`); streaming
    callers dedup downstream (`dropDuplicates` on the sink table, or
    accept at-least-once pair delivery). When no bucket saturates, the
    deduped pair set EQUALS the batch ``minhash_lsh_pairs`` over the same
    docs (parity-tested across forced microbatches).

    Cap semantics differ from batch BY NECESSITY: batch drops a hot
    bucket retroactively (it sees the final size); a stream cannot
    retract emitted pairs, so a bucket stops emitting once it holds
    ``max_bucket_size`` ids (state stays bounded; the saturation flag is
    kept so late arrivals stay suppressed). State per bucket is at most
    cap ids + a bool.

    STRING IDS ONLY: the reader schema declares ``id_col`` as string (a
    non-string parquet column fails at scan), and the kernel orients
    pairs with Python str min/max to match the batch operator's
    ``a.id < b.id`` — which only agrees with the batch orientation when
    the id type IS string. Cast ids upstream if they are numeric."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = f"{id_col} string, {text_col} string"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ids, sat = list(state.get[0]), bool(state.get[1])
        else:
            ids, sat = [], False
        known = set(ids)
        out_a: list[str] = []
        out_b: list[str] = []
        for pdf in pdfs:
            for nid in pdf["id"]:
                nid = str(nid)
                if nid in known:
                    continue  # same doc re-delivered: no self-pairs
                if sat or len(ids) >= max_bucket_size:
                    sat = True
                    continue
                for e in ids:
                    out_a.append(min(e, nid))
                    out_b.append(max(e, nid))
                ids.append(nid)
                known.add(nid)
        state.update((ids, sat))
        yield pd.DataFrame(
            {
                "id_a": out_a,
                "id_b": out_b,
                "band_idx": [int(key[0])] * len(out_a),
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    banded = stateless_minhash_bands(
        stream, id_col, text_col, n_hashes, bands, shingle_k
    )
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        update,
        outputStructType="id_a string, id_b string, band_idx int",
        stateStructType="ids array<string>, saturated boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_kmv_distinct(
    spark,
    input_dir: str,
    key_col: str = "user_id",
    group_col: str = "event_type",
    k: int = 64,
    max_files_per_trigger: int = 1,
):
    """Running distinct-count KMV sketch per group over an unbounded
    stream (the streaming twin of ``operators.sketch.kmv_sketch``).

    State per group = the bottom-k DISTINCT 52-bit hashes — bounded at k
    longs regardless of stream length, and the same mergeable summary the
    batch operator produces, so the stream's final estimate EQUALS the
    batch sketch over the same rows (parity-tested; the estimator
    replicates ``sketch._estimate`` bit-for-bit in Python doubles). The
    hash is computed JVM-side (same md5-prefix column) before the
    stateful kernel; the kernel only folds longs into a sorted set.

    Each microbatch emits (group, n_retained, est_distinct) for groups it
    touched; n_retained and est_distinct are monotone nondecreasing, so
    the per-group row with the max (n_retained, est_distinct) is the
    current global answer at any point in the stream.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from conflation_spark.operators.sketch import KMV_HASH_SPACE, kmv_hash

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def update(key, pdfs, state: GroupState):
        hs = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            hs.update(int(h) for h in pdf["_h"])
        bottom = sorted(hs)[:k]
        state.update((bottom,))
        if len(bottom) < k:
            est = len(bottom)
        else:
            est = int(math.floor((k - 1.0) * KMV_HASH_SPACE / (bottom[-1] + 1.0) + 0.5))
        yield pd.DataFrame(
            {
                "group_key": [key[0]],
                "n_retained": [len(bottom)],
                "est_distinct": [est],
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    hashed = stream.select(
        F.col(group_col).alias("group_key"), kmv_hash(F.col(key_col)).alias("_h")
    )
    return hashed.groupBy("group_key").applyInPandasWithState(
        update,
        outputStructType="group_key string, n_retained long, est_distinct long",
        stateStructType="sketch array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals(spark, input_dir: str, max_files_per_trigger: int = 1):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running event totals that persist across microbatches.

    State = (total_events, total_value) per user_id; each microbatch emits
    one row per active user with the batch's contribution and the running
    totals — the building block for incremental per-tile speed profiles
    (state survives between trigger cycles exactly like a per-cell speed
    histogram would).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def update(key, pdfs, state: GroupState):
        n_batch = 0
        v_batch = 0.0
        for pdf in pdfs:
            n_batch += len(pdf)
            v_batch += float(pdf["value"].sum())
        if state.exists:
            n_total, v_total = state.get
        else:
            n_total, v_total = 0, 0.0
        n_total += n_batch
        v_total += v_batch
        state.update((n_total, float(v_total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [n_batch],
                "total_events": [n_total],
                "total_value": [round(v_total, 2)],
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, batch_events long, total_events long, total_value double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_doc_embeddings(spark, input_dir: str) -> DataFrame:
    """readStream over a textdocs directory -> per-doc unit-vector
    embeddings at ingest time, via the stateless per-row kernel
    (`operators.embed.embed_documents_stateless`): zero shuffle, zero
    state, output EXACTLY equal to the batch `embed_documents`
    aggregate plan (integer raw sums + IEEE normalization; parity
    tested) — so a stream can feed the same PCA / ANN / semantic-dedup
    stages as a batch corpus without re-embedding."""
    from conflation_spark.operators.embed import embed_documents_stateless

    schema = "text_id string, text string"
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return embed_documents_stateless(stream, "text_id", "text")
