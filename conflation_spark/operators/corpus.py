"""Corpus-composition operators: per-source document caps, source-level
stats, and leakage-safe train/val/test splits.

Web-scale corpus builds (C4, RefinedWeb, Gopher/MassiveText) bound any
single domain's share with a per-domain document cap (a handful of hosts
otherwise dominate the crawl), report per-source composition stats, and
split train/held-out at the DEDUP-CLUSTER level rather than the document
level — a near-duplicate of a training doc in the test split is leakage
the per-doc split cannot see. The reference repo has no analog (its
grouping is geographic, conflation/aggregation.py); this is a scale-tier
extension alongside `operators/sampling.py`.

Determinism (the repo's oracle-gate rules): every keep/assign decision
derives from the md5 content hash of a stable key (the `sampling.py`
convention) — a pure function of (key, salt), identical at any
parallelism and reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conflation_spark.operators.sampling import _thr_hex
from conflation_spark.operators.sketch import kmv_hash

CAP_SALT_PARTS = 16  # phase-1 salt fan-out for the per-source cap


def per_source_cap(
    df: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt_parts: int = CAP_SALT_PARTS,
) -> DataFrame:
    """Keep at most ``cap`` documents per source — the RefinedWeb-style
    anti-dominance measure. Selection is deterministic: the ``cap``
    lowest (md5-hash, id) documents of each source survive, so the kept
    set is a pure function of the data (stable under reruns, resumes,
    and engine changes — NOT "first cap seen", which depends on
    partition order).

    Skew-safe two-phase ranking (the grouped-KMV pattern,
    sketch.py:_grouped_bottom_k): phase 1 ranks within (source, salt)
    where salt fans each source over ``salt_parts`` buckets, discarding
    all but ``cap`` rows per bucket; phase 2 re-ranks the <=
    salt_parts*cap survivors per source. No task ever sorts a whole hot
    domain — at the 100 TB tier a single host can own billions of docs,
    and a one-phase per-source window would sort them in one task.

    Output: all input columns + ``cap_rank`` (1-based within source).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = kmv_hash(F.col(id_col)).alias("_h")
    salted = df.select("*", h).withColumn(
        "_salt", F.pmod(F.xxhash64("_h"), F.lit(salt_parts))
    )
    w1 = Window.partitionBy(source_col, "_salt").orderBy("_h", id_col)
    phase1 = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= cap)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(source_col).orderBy("_h", id_col)
    return (
        phase1.withColumn("cap_rank", F.row_number().over(w2).cast("long"))
        .where(F.col("cap_rank") <= cap)
        .drop("_h")
    )


def source_stats(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source composition report: document count, total/mean
    characters, distinct-language count. One hash aggregation with
    map-side partials; the mean is integerized as EXACT long arithmetic
    (total*100 div n — no double mean ever crosses engines, and no
    2^53 precision cliff at corpus-scale totals).
    """
    agg = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.count_distinct("lang").alias("n_langs")
        if "lang" in df.columns
        else F.lit(0).alias("n_langs"),
    )
    return agg.select(
        source_col,
        "n_docs",
        F.col("total_chars").cast("long").alias("total_chars"),
        F.expr("(total_chars * 100) div n_docs").cast("long").alias("mean_chars_c"),
        F.col("n_langs").cast("long").alias("n_langs"),
    )


def cluster_safe_split(
    df: DataFrame,
    labels: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "",
    digits: int = 8,
) -> DataFrame:
    """Assign train/val/test splits at the DEDUP-CLUSTER level: every
    member of a near-duplicate cluster lands in the same split, so no
    test document has a near-duplicate in train (the leakage a per-doc
    split cannot prevent; The Pile / Llama eval hygiene). ``labels`` is
    a (id, cluster) table — `cluster.dedup_clusters` output; documents
    absent from it are their own singleton cluster (coalesce to own id).

    The split is the md5-hash threshold machinery of `sampling.py`
    applied to the CLUSTER id: h = first ``digits`` hex chars of
    md5(cluster || salt), compared against cumulative weight thresholds
    — a pure function of (cluster, salt), shuffle-free past the label
    join, and identical in DuckDB. Weights must sum to 1 (+-1e-9); split
    names are assigned in sorted-name order for determinism.

    Output: all input columns + ``cluster_id`` + ``split``.
    """
    weights = weights if weights is not None else {"test": 0.05, "train": 0.9, "val": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    lab = labels.select(
        F.col(id_col).alias("_lid"), F.col(cluster_col).alias("_lcluster")
    )
    joined = df.join(lab, F.col(id_col) == F.col("_lid"), "left").drop("_lid")
    cluster = F.coalesce(F.col("_lcluster"), F.col(id_col).cast("string"))
    h = F.substring(F.md5(F.concat(cluster.cast("string"), F.lit(salt))), 1, digits)
    expr = None
    cum = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < F.lit(_thr_hex(cum, digits))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return joined.select(
        "*", cluster.alias("cluster_id"), expr.alias("split")
    ).drop("_lcluster")


# URL analysis — shared with the DuckDB twin VERBATIM (both dialects agree
# on every construct used: regexp_extract with a group index, regexp_replace,
# length, replace). The reference has no URL layer (its keys are tile/image
# ids); this is the UT1/C4-style domain-signal step of a web corpus build.
URL_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
URL_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
URL_QUERY_RE = "\\?([^#]*)"
URL_PORT_RE = ":[0-9]+$"
URL_TLD_RE = "\\.([a-z0-9-]+)$"


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL structural features for crawl curation: ``host``
    (lowercased, port stripped), ``tld`` (last dot-label — naive by
    design: multi-label public suffixes like co.uk yield 'uk'; a real
    PSL pass is a lookup-table join, not parsing), ``path_depth``
    (non-empty path segments), ``n_params`` (query keys, '&'-counted),
    ``is_https``, plus ``host_docs`` — the per-host document count that
    feeds domain-cap / anti-dominance filters (`per_source_cap`).

    Everything except the count is pure codegen string work (zero
    shuffle, no UDF). The count is a groupBy partial-agg + an equi-join
    back on host — NOT a window count, which would drag every row of a
    hot host into one task; the join's skew is AQE-splittable, a
    single-task window is not.
    """
    url = F.lower(F.col(url_col))
    host = F.regexp_replace(
        F.regexp_extract(url, URL_HOST_RE, 1), URL_PORT_RE, ""
    )
    path = F.regexp_extract(url, URL_PATH_RE, 1)
    # strip trailing slashes, then depth = number of '/' separators
    p2 = F.regexp_replace(path, "/+$", "")
    depth = (F.length(p2) - F.length(F.regexp_replace(p2, "/", ""))).cast("long")
    query = F.regexp_extract(url, URL_QUERY_RE, 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, "&", "")) + 1
    ).cast("long")
    feats = df.select(
        F.col(url_col),
        host.alias("host"),
        F.regexp_extract(host, URL_TLD_RE, 1).alias("tld"),
        depth.alias("path_depth"),
        n_params.alias("n_params"),
        url.startswith("https://").cast("long").alias("is_https"),
    )
    counts = feats.groupBy("host").agg(F.count(F.lit(1)).alias("host_docs"))
    return feats.join(counts, "host")
