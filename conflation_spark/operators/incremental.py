"""Incremental deduplication: new-batch (delta) vs an existing corpus.

A real pipeline ingests a daily delta and must dedup it against the
full corpus WITHOUT recomputing the corpus: at 10^12 documents,
re-shingling and re-minhashing the whole history per day is the cost
that kills the naive design. The contract here:

1. ``checkpoint_band_table`` persists the corpus's minhash band rows
   (id, band_idx, band_hash) ONCE as a parquet table BUCKETED on
   ``band_hash``. Bucketing is the load-bearing choice: a bucketed scan
   reports hash(band_hash) output partitioning, so the later delta-join
   shuffles ONLY the delta — the corpus is never re-hashed (its text is
   not even read) and never re-shuffled (plan-asserted in tests; the
   session's ``requireAllClusterKeysForCoPartition=false`` lets the
   (band_idx, band_hash) join accept the band_hash-only partitioning,
   CLAUDE.md rule 9).
2. ``incremental_minhash_pairs`` bands the DELTA only and emits the new
   candidate pairs: delta x delta (self-join) plus delta x corpus
   (join against the checkpointed band table).
3. ``incremental_components`` folds the new pairs into the PRIOR label
   assignment without replaying corpus pairs: a prior label table is the
   transitive closure of the corpus pair graph, so the star edges
   (id -> cluster_id) generate exactly the same components — running CC
   on (label stars UNION new pairs) provably equals from-scratch CC on
   (corpus pairs UNION new pairs), and label stars have diameter 2, so
   the iteration count stays at the NEW graph's diameter.

End-state equality with the from-scratch run is tested exactly
(tests/test_incremental.py). The reference has no incremental analog
(its dedup is per-scan sequence-ID distinct, mapillary.py:520-616
re-lists every tile each run); this is the LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conflation_spark.operators.cluster import connected_components
from conflation_spark.operators.dedup import _minhash_banded, drop_hot_buckets
from conflation_spark.operators.spread import local_df

BAND_BUCKETS = 16


def _drop_stale_table(spark, table_name: str) -> None:
    """Make ``saveAsTable(table_name)`` safe to run: drop the table if the
    catalog knows it, else remove the stale managed-table LOCATION a
    previous session's in-memory catalog may have left behind (saveAsTable
    refuses to reuse it: LOCATION_ALREADY_EXISTS).

    When the table IS in the catalog, DROP resolves the real location
    itself — a managed drop deletes its directory, an EXTERNAL table's
    data belongs to the user — so no filesystem surgery happens and a
    same-named external directory is never touched. Only when the catalog
    has no entry do we delete, and then only the DEFAULT managed location
    under the warehouse dir, resolving the database qualifier (explicit
    ``db.table``, else the session's current database) so a non-default
    database cleans <warehouse>/<db>.db/<table>, not <warehouse>/<table>.
    An external table registered at that warehouse path by a DIFFERENT
    in-memory session is unknowable here; keeping external data outside
    the warehouse's managed namespace is the catalog contract this
    relies on."""
    if spark.catalog.tableExists(table_name):
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        return
    parts = table_name.lower().split(".")
    # strip a leading catalog qualifier if present (spark_catalog.db.t)
    if len(parts) >= 2:
        db, tbl = parts[-2], parts[-1]
    else:
        db, tbl = spark.catalog.currentDatabase().lower(), parts[-1]
    rel = tbl if db == "default" else f"{db}.db/{tbl}"
    jvm = spark._jvm
    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = jvm.org.apache.hadoop.fs.Path(wh, rel)
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)


def checkpoint_band_table(
    df: DataFrame,
    table_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    n_buckets: int = BAND_BUCKETS,
    mode: str = "overwrite",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Compute the corpus band table and persist it bucketed+sorted on
    ``band_hash`` (catalog table under the warehouse dir). Returns the
    re-registered table — reading it back costs a bucketed file scan,
    zero hashing, zero shuffle. ``mode='append'`` grows the corpus
    checkpoint with a new batch's bands after that batch is folded in.

    ``max_bucket_size`` drops band buckets hotter than the cap BEFORE
    persisting (the ``minhash_lsh_pairs`` boilerplate guard applied at
    checkpoint time): every later delta join against this checkpoint is
    then bounded at cap x |delta bucket| candidate rows per bucket. Use
    ``dedup.lsh_hot_buckets`` on the same corpus to audit what the cap
    removed; note the cap is per-WRITE — with ``mode='append'`` a bucket
    can exceed the cap across appends (re-checkpoint periodically)."""
    spark = df.sparkSession
    if mode == "overwrite":
        _drop_stale_table(spark, table_name)
    else:
        # an append must match the EXISTING table's bucket spec, not the
        # call's n_buckets default
        n_buckets = _table_num_buckets(spark, table_name, n_buckets)
    banded = _minhash_banded(df, id_col, text_col, n_hashes, bands, shingle_k)
    if max_bucket_size is not None:
        banded = drop_hot_buckets(banded, ["band_idx", "band_hash"], max_bucket_size)
    (
        # repartition on the bucket key first: without it every write task
        # opens a file per bucket it sees (tasks x buckets small files +
        # a per-task sort); aligned, each task holds exactly one bucket
        # (guide §6 output sizing — measured 2.7x faster at r6 baseline)
        banded.repartition(n_buckets, F.col("band_hash"))
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, "band_hash")
        .sortBy("band_hash")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def corpus_self_pairs(spark, table_name: str) -> DataFrame:
    """Corpus-internal candidate pairs from the checkpointed band table —
    both join sides are the bucketed scan, so the self-join runs with NO
    exchange at all (co-partitioned on band_hash) and no re-hashing."""
    banded = spark.table(table_name)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def incremental_minhash_pairs(
    spark,
    corpus_table: str,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """New candidate pairs introduced by the delta: delta x delta plus
    delta x corpus. Only the delta is shingled/hashed; the corpus side is
    the bucketed checkpoint scan (shuffle lands on the delta branch).
    Band parameters MUST match the ones the checkpoint was built with —
    band hashes are only comparable within one (n_hashes, bands,
    shingle_k, seed) family.

    ``max_bucket_size`` caps the DELTA side's band buckets (drop before
    both joins), pairing with the checkpoint-time cap on the corpus side
    (``checkpoint_band_table(max_bucket_size=...)``): a surviving bucket
    contributes at most cap_delta x cap_corpus cross pairs and
    cap_delta^2/2 delta pairs. This is a per-side guard, NOT the exact
    whole-corpus bucket size the batch ``minhash_lsh_pairs`` cap sees —
    an incremental run cannot know future totals; re-checkpoint to
    re-apply the global cap."""
    d = _minhash_banded(delta, id_col, text_col, n_hashes, bands, shingle_k)
    if max_bucket_size is not None:
        d = drop_hot_buckets(d, ["band_idx", "band_hash"], max_bucket_size)
    # the delta band table feeds THREE join subtrees (delta x delta both
    # sides + delta x corpus) — materialize the proxy rows once instead
    # of re-hashing the delta three times (no Catalyst CSE across trees)
    d = d.localCheckpoint(eager=True)
    corpus = spark.table(corpus_table)
    dd_a, dd_b = d.alias("a"), d.alias("b")
    delta_delta = dd_a.join(
        dd_b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    dc_d, dc_c = d.alias("d"), corpus.alias("c")
    delta_corpus = dc_d.join(
        dc_c,
        (F.col("d.band_idx") == F.col("c.band_idx"))
        & (F.col("d.band_hash") == F.col("c.band_hash")),
    ).select(
        F.least(F.col("d.id"), F.col("c.id")).alias("id_a"),
        F.greatest(F.col("d.id"), F.col("c.id")).alias("id_b"),
    )
    return delta_delta.unionByName(delta_corpus).where(
        F.col("id_a") != F.col("id_b")
    ).distinct()


def checkpoint_emb_band_table(
    df: DataFrame,
    table_name: str,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    dim: int = 64,
    n_buckets: int = BAND_BUCKETS,
    mode: str = "overwrite",
) -> DataFrame:
    """Embedding twin of ``checkpoint_band_table``: persist the corpus's
    hyperplane-LSH band rows (id, band_idx, band_val — the
    ``dedup.embedding_cosine_pairs`` family) bucketed on ``band_val``.
    Folding a delta then re-signs ONLY the delta (the corpus matmul+LSH
    never re-runs); the corpus VECTORS are still read at cosine-verify
    time — that's a narrow column scan, not the signature compute."""
    from conflation_spark.operators.dedup import (
        EMB_LSH_BANDS,
        EMB_LSH_BITS_PER_BAND,
        EMB_LSH_SEED,
        banded_signature_udf,
    )
    from conflation_spark.functions.kernels import lsh_planes

    spark = df.sparkSession
    if mode == "overwrite":
        _drop_stale_table(spark, table_name)
    else:
        n_buckets = _table_num_buckets(spark, table_name, n_buckets)
    planes = lsh_planes(EMB_LSH_BANDS * EMB_LSH_BITS_PER_BAND, dim, EMB_LSH_SEED)
    sig = banded_signature_udf(planes, EMB_LSH_BANDS)
    banded = (
        df.select(F.col(id_col).alias("id"), sig(F.col(vec_col)).alias("bands"))
        .repartition("id")  # UDF exchange barrier (CLAUDE.md rule 8)
        .select("id", F.posexplode("bands").alias("band_idx", "band_val"))
    )
    (
        # one task per bucket on the write (see checkpoint_band_table)
        banded.repartition(n_buckets, F.col("band_val"))
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, "band_val")
        .sortBy("band_val")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def incremental_embedding_pairs(
    spark,
    corpus_table: str,
    corpus_vectors: DataFrame,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """New VERIFIED cosine near-dup pairs introduced by a delta vector
    batch: delta x delta plus delta x corpus candidates from the band
    join (corpus side = bucketed checkpoint, zero re-signing), then the
    shared exact-cosine kernel (``dedup.verify_cosine_pairs``) over the
    union of corpus and delta vectors. Same (id_a, id_b, cosine_c)
    contract as the batch ``embedding_cosine_pairs``; equality with the
    batch run over corpus+delta is tested (recall caveats at the
    threshold boundary are the family's, identical in both paths)."""
    from conflation_spark.operators.dedup import (
        EMB_LSH_BANDS,
        EMB_LSH_BITS_PER_BAND,
        EMB_LSH_SEED,
        banded_signature_udf,
        verify_cosine_pairs,
    )
    from conflation_spark.functions.kernels import lsh_planes

    planes = lsh_planes(EMB_LSH_BANDS * EMB_LSH_BITS_PER_BAND, dim, EMB_LSH_SEED)
    sig = banded_signature_udf(planes, EMB_LSH_BANDS)
    d = (
        delta.select(F.col(id_col).alias("id"), sig(F.col(vec_col)).alias("bands"))
        .repartition("id")
        .select("id", F.posexplode("bands").alias("band_idx", "band_val"))
    )
    corpus = spark.table(corpus_table)
    dd_a, dd_b = d.alias("a"), d.alias("b")
    delta_delta = dd_a.join(
        dd_b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    dc_d, dc_c = d.alias("d"), corpus.alias("c")
    delta_corpus = dc_d.join(
        dc_c,
        (F.col("d.band_idx") == F.col("c.band_idx"))
        & (F.col("d.band_val") == F.col("c.band_val")),
    ).select(
        F.least(F.col("d.id"), F.col("c.id")).alias("id_a"),
        F.greatest(F.col("d.id"), F.col("c.id")).alias("id_b"),
    )
    cands = (
        delta_delta.unionByName(delta_corpus)
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    # a re-delivered delta batch can overlap the corpus; duplicated ids in
    # the verify input would join each candidate pair multiple times and
    # emit duplicate verified rows. Corpus-vs-delta conflicts dedup
    # DETERMINISTICALLY in the delta's favor (anti-join — dropDuplicates
    # across the union would keep an arbitrary row, flapping
    # near-threshold pairs when a re-delivered id carries an UPDATED
    # vector); ids duplicated WITHIN a side still need dropDuplicates
    # (at-least-once re-delivery concatenated into one batch) — there an
    # arbitrary-but-single row is the best available semantics
    corpus_only = (
        corpus_vectors.select(id_col, vec_col)
        .dropDuplicates([id_col])
        .join(delta.select(id_col), id_col, "left_anti")
    )
    all_vecs = corpus_only.unionByName(
        delta.select(id_col, vec_col).dropDuplicates([id_col])
    )
    return verify_cosine_pairs(cands, all_vecs, id_col, vec_col, threshold)


IVF_DRIFT_FACTOR = 1.5  # delta p95 assignment distance vs corpus baseline
IVF_DRIFT_BINS = 128


def _ivf_assign_dist_udf(centroids):
    """pandas_udf: vector -> struct(list_id, d2) — nearest centroid plus
    its squared distance (the drift-detection signal), same explicit
    (x - c)^2 arithmetic as ``similarity.ivf_assign_udf`` so assignments
    agree bit-for-bit with the batch operator and the SQL oracle."""
    import numpy as np
    import pandas as pd

    from conflation_spark.functions.kernels import stack_vectors

    # no type hints: Spark 4 infers UDF style from annotations and rejects
    # the Series -> DataFrame (struct-returning) shape when annotated
    def assign(col):
        mat = stack_vectors(col)
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        li = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {
                "list_id": li.astype("int64"),
                "d2": d2[np.arange(len(li)), li],
            }
        )

    return F.pandas_udf(assign, "list_id long, d2 double").asNondeterministic()


def checkpoint_ivf_index(
    df: DataFrame,
    table_name: str,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    n_buckets: int = BAND_BUCKETS,
) -> DataFrame:
    """Persist an IVF index: (id, vec, list_id, d2) BUCKETED on
    ``list_id`` — searching then READS ONLY THE PROBED BUCKETS (bucket
    pruning on the list_id filter), and folding a delta appends without
    touching corpus files. Alongside it: ``<table>_centroids`` (the
    trained centroids, so delta assignment and probing reuse the exact
    floats) and ``<table>_stats`` (the corpus's exact p95 assignment
    distance — the drift-detection baseline).

    The index-once/search-many contract is the point at scale: the
    corpus matmul+argmin runs exactly once here; ``incremental_ivf_assign``
    touches only deltas and ``incremental_ivf_topk`` never re-assigns."""
    spark = df.sparkSession
    for t in (table_name, f"{table_name}_centroids", f"{table_name}_stats"):
        _drop_stale_table(spark, t)
    assign = _ivf_assign_dist_udf(centroids)
    idx = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("_a", assign(F.col("vec")))
        .repartition("id")  # UDF exchange barrier (CLAUDE.md rule 8)
        .select("id", "vec", F.col("_a.list_id").alias("list_id"), F.col("_a.d2").alias("d2"))
    )
    (
        # one task per bucket on the write (see checkpoint_band_table)
        idx.repartition(n_buckets, F.col("list_id"))
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, "list_id")
        .sortBy("list_id")
        .saveAsTable(table_name)
    )
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    local_df(spark, cent_rows, "list_id long, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").saveAsTable(f"{table_name}_centroids")
    p95 = (
        spark.table(table_name)
        .agg(F.expr("percentile(d2, 0.95)").alias("p"))
        .collect()[0]["p"]
    )
    # empty corpus: percentile is NULL; store 0.0 (any delta distance
    # then reads as drift, which is the right signal for an empty index)
    local_df(
        spark,
        [("d2_p95", float(p95) if p95 is not None else 0.0)],
        "metric string, value double",
    ).coalesce(1).write.mode("overwrite").saveAsTable(f"{table_name}_stats")
    return spark.table(table_name)


def _table_num_buckets(spark, table_name: str, default: int) -> int:
    """Bucket count of an existing table from the catalog (DESCRIBE
    EXTENDED 'Num Buckets' row) — appends must match the table's own
    spec, not a constant."""
    try:
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect():
            if r["col_name"] == "Num Buckets":
                return int(r["data_type"])
    except Exception:
        pass
    return default


def load_ivf_centroids(spark, table_name: str):
    """Centroids back from the checkpoint, row-ordered by list_id — the
    exact float64s the index was assigned with."""
    import numpy as np

    rows = spark.table(f"{table_name}_centroids").orderBy("list_id").collect()
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def incremental_ivf_assign(
    spark,
    table_name: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    append: bool = True,
) -> DataFrame:
    """Assign ONLY the delta against the checkpointed centroids (zero
    corpus compute) and optionally fold it into the index table
    (bucketed append). Returns the delta assignment (id, vec, list_id,
    d2) — bit-equal to what a full rebuild at the same centroids would
    give those rows (tested)."""
    centroids = load_ivf_centroids(spark, table_name)
    assign = _ivf_assign_dist_udf(centroids)
    d = (
        delta.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("_a", assign(F.col("vec")))
        .repartition("id")
        .select("id", "vec", F.col("_a.list_id").alias("list_id"), F.col("_a.d2").alias("d2"))
    )
    if append:
        n_buckets = _table_num_buckets(spark, table_name, BAND_BUCKETS)
        (
            d.repartition(n_buckets, F.col("list_id"))
            .write.format("parquet")
            .mode("append")
            .bucketBy(n_buckets, "list_id")
            .sortBy("list_id")
            .saveAsTable(table_name)
        )
        return spark.table(table_name)
    return d


def ivf_drift_check(
    spark,
    table_name: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    factor: float = IVF_DRIFT_FACTOR,
    n_bins: int = IVF_DRIFT_BINS,
) -> dict:
    """Centroid-drift detector: if the delta's p95 assignment distance
    exceeds ``factor`` x the corpus baseline, the centroids no longer
    describe the incoming distribution — signal a re-train. The delta
    quantile comes from the MERGEABLE fixed-grid histogram sketch
    (`operators/sketch.py`) on [0, 4 x corpus_p95), so daily deltas can
    also be sketched once and merged across days; error <= one bin width
    (~3% of the baseline at 128 bins), far below any sane ``factor``.
    Returns {"corpus_p95", "delta_p95", "retrain"}."""
    from conflation_spark.operators.sketch import histogram_quantile, quantile_histogram

    base = {
        r["metric"]: r["value"] for r in spark.table(f"{table_name}_stats").collect()
    }
    corpus_p95 = base["d2_p95"]
    centroids = load_ivf_centroids(spark, table_name)
    assign = _ivf_assign_dist_udf(centroids)
    d = (
        delta.select(F.col(vec_col).alias("vec"))
        .withColumn("_a", assign(F.col("vec")))
        .select(F.col("_a.d2").alias("d2"))
    )
    hi = max(4.0 * corpus_p95, 1e-12)
    hist = quantile_histogram(d, "d2", 0.0, hi, n_bins)
    q = histogram_quantile(hist, 0.95, 0.0, hi, n_bins).collect()
    delta_p95 = float(q[0]["q_value"]) if q else 0.0
    return {
        "corpus_p95": float(corpus_p95),
        "delta_p95": delta_p95,
        "retrain": delta_p95 > factor * corpus_p95,
    }


def incremental_ivf_topk(
    spark,
    table_name: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "vec",
) -> DataFrame:
    """ANN search over the CHECKPOINTED index: probe lists are computed
    driver-side from the stored centroids over the bounded query set
    (same enforced contract as ``similarity.brute_force_topk``), and the
    index scan is filtered to exactly the probed list_ids — with the
    table bucketed on list_id that is a bucket-pruned scan (only probed
    buckets are READ, plan-asserted in tests). No corpus re-assignment,
    no corpus shuffle: broadcast probes -> bucketed scan -> vectorized
    cosine kernel -> top-k window. Same output contract as
    ``similarity.ivf_topk`` and bit-equal to it at the same centroids
    (tested)."""
    import numpy as np

    from conflation_spark.operators.similarity import (
        _collect_query_matrix,
        _cosine_pairs_kernel,
        _topk_window,
        TOPK_SCHEMA,
    )

    centroids = load_ivf_centroids(spark, table_name)
    qids, qmat, _ = _collect_query_matrix(queries, query_id_col, vec_col)
    d2 = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    probe_rows = [
        (str(qids[i]), [float(x) for x in qmat[i]], int(li))
        for i in range(len(qids))
        for li in order[i]
    ]
    qp = local_df(
        spark, probe_rows, "query_id string, qvec array<double>, list_id long"
    )
    lists = sorted({int(li) for row in order for li in row})
    idx = spark.table(table_name).where(F.col("list_id").isin(lists))
    joined = (
        F.broadcast(qp)
        .join(idx, "list_id")
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", "qvec", F.col("id").alias("neighbor_id"), F.col("vec").alias("evec"))
    )
    scored = joined.mapInPandas(_cosine_pairs_kernel, schema=TOPK_SCHEMA)
    return _topk_window(scored, k)


def incremental_components(
    new_pairs: DataFrame,
    prior_labels: DataFrame,
    id_col: str = "id",
    label_col: str = "cluster_id",
    max_iter: int = 25,
) -> DataFrame:
    """Fold new pairs into a prior (id, cluster_id) assignment on the
    CONTRACTED graph: each endpoint of a new pair is relabeled to its
    prior cluster representative (unseen ids represent themselves), CC
    runs over those contracted pairs — O(|new pairs|) work regardless of
    corpus size — and the merged representative propagates back to the
    members of touched clusters with one broadcast join. Exactly equal
    to from-scratch CC over (old pairs UNION new pairs): contracting a
    cluster to its representative preserves components, and because a
    representative IS its cluster's minimum id, the contracted
    component's minimum is the global minimum of the merged membership.

    Scale shape (the earlier design ran CC over corpus-wide star edges —
    a full-corpus shuffle per round, per delta): the corpus label table
    is now only SCANNED (relabel join + member propagation, both with
    the tiny side broadcastable), never iterated over; the CC loop's
    shuffles touch contracted pairs only, and its round count is the
    contracted graph's diameter, independent of the corpus.

    Returns labels for every id in a touched cluster or a new pair;
    callers keep untouched ids as-is (see ``incremental_dedup``)."""
    pl = prior_labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("lbl"))
    la = pl.select(F.col("id").alias("id_a"), F.col("lbl").alias("_la"))
    lb = pl.select(F.col("id").alias("id_b"), F.col("lbl").alias("_lb"))
    contracted = (
        new_pairs.select("id_a", "id_b")
        .join(la, "id_a", "left")
        .join(lb, "id_b", "left")
        .select(
            F.coalesce(F.col("_la"), F.col("id_a")).alias("id_a"),
            F.coalesce(F.col("_lb"), F.col("id_b")).alias("id_b"),
        )
    )
    cc = connected_components(contracted, "id_a", "id_b", max_iter=max_iter)
    # propagate merged representatives to every member of a touched
    # cluster (cc is small — one broadcastable join against the corpus
    # labels); new ids outside the prior table carry their own cc row
    merged = cc.select(F.col("id").alias("lbl"), F.col("cluster_id").alias("_new"))
    members = pl.join(merged, "lbl").select(
        "id", F.col("_new").alias("cluster_id")
    )
    new_only = cc.join(pl, "id", "left_anti")
    return members.unionByName(new_only)


def incremental_dedup(
    spark,
    corpus_table: str,
    prior_labels: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_iter: int = 25,
) -> DataFrame:
    """Full incremental cluster assignment for corpus + delta: every id
    (prior ids and delta ids) gets a cluster_id — merged across the delta
    bridge where new pairs connect previously distinct clusters — plus
    the canonical ``keep`` flag. One pass over the delta text, zero over
    the corpus text."""
    pairs = incremental_minhash_pairs(
        spark, corpus_table, delta, id_col, text_col, n_hashes, bands, shingle_k
    )
    cc = incremental_components(pairs, prior_labels, max_iter=max_iter)
    all_ids = (
        prior_labels.select(F.col("id"))
        .unionByName(delta.select(F.col(id_col).alias("id")))
        .distinct()
    )
    # ids untouched by new pairs keep their prior label; brand-new
    # singletons label themselves
    prior = prior_labels.select("id", F.col("cluster_id").alias("_prior"))
    return (
        all_ids.join(cc, "id", "left")
        .join(prior, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster_id"), F.col("_prior"), F.col("id")).alias(
                "cluster_id"
            ),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


# ------------------------------------------------------- incremental PCA

def checkpoint_pca_moments(
    df: DataFrame, table_name: str, vec_col: str, dim: int
) -> DataFrame:
    """Persist the corpus's PCA moment aggregates (the d^2+d+1 (idx, val)
    rows of `operators/pca.embedding_moments`) as a table. Moments are
    PLAIN SUMS — the sufficient statistic for mean/covariance — so a
    delta batch folds in with one O(delta) scan plus an O(d^2) merge;
    the corpus vectors are never re-read (the same index-once contract
    as the band tables and the IVF index)."""
    from conflation_spark.operators.pca import embedding_moments

    spark = df.sparkSession
    _drop_stale_table(spark, table_name)
    embedding_moments(df, vec_col, dim).coalesce(1).write.mode(
        "overwrite"
    ).saveAsTable(table_name)
    return spark.table(table_name)


def incremental_pca_update(
    spark, table_name: str, delta: DataFrame, vec_col: str, dim: int
) -> DataFrame:
    """Fold a delta batch into the checkpointed moments WITHOUT touching
    the corpus: scan only the delta (one mapInPandas moment pass), union
    with the stored d^2+d+1 rows, and sum per index. The merged result
    (model-sized by contract) is materialized on the driver before the
    overwrite so the table is never read and rewritten in one plan.
    Equality with a full recompute holds exactly under the gated 1e6
    integerization (float sums reassociate at ~1e-13 relative)."""
    from conflation_spark.operators.pca import embedding_moments

    delta_mom = embedding_moments(delta, vec_col, dim)
    merged = (
        spark.table(table_name)
        .unionByName(delta_mom)
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
    )
    rows = [(int(r["idx"]), float(r["val"])) for r in merged.collect()]
    local_df(spark, rows, "idx int, val double").coalesce(1).write.mode(
        "overwrite"
    ).saveAsTable(table_name)
    return spark.table(table_name)


def incremental_pca_covariance(
    spark, table_name: str, dim: int, scale: int = 1_000_000
) -> DataFrame:
    """Integerized covariance entries straight from the checkpointed
    moments — zero corpus work; the gated twin of `embedding_pca` for
    the incremental path."""
    from conflation_spark.operators.pca import moments_to_covariance

    return moments_to_covariance(spark.table(table_name), dim, scale)


def incremental_pca_fit(spark, table_name: str, dim: int, k: int):
    """PCAModel from the checkpointed moments (driver-side eigh, same
    deterministic sign convention as `pca.pca_fit`)."""
    from conflation_spark.operators.pca import fit_from_moments

    return fit_from_moments(spark.table(table_name), dim, k)
