"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent on PARTITIONING (Bernoulli per row in
partition order), so the same fraction on the same data yields different
rows after any repartition/scale-up — useless for reproducible corpus
construction or cross-engine verification. These operators decide
membership from a content hash of a stable key instead: the sample is a
pure function of (key, salt, fraction), identical on one executor or a
thousand, resumable, and expressible in any engine with md5 (the DuckDB
oracles run the same predicate).

Mechanics: keep a row iff the first ``digits`` hex chars of
``md5(key || salt)`` compare below the threshold ``hex(floor(fraction *
16^digits))``. Hex strings compare lexicographically == numerically
('0'<'9'<'a'<'f' in ASCII), so the whole predicate is a codegen'd string
compare on a scan — no shuffle, no UDF, fraction resolution 16^-digits
(~2.3e-10 at the default 8). Different ``salt`` values give independent
draws (held-out sets, A/B splits) without correlation between them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _thr_hex(fraction: float, digits: int) -> str:
    """Zero-padded hex threshold; 'g' (> 'f' in ASCII) for fraction 1.0 so
    the keep-everything threshold still lexicographically dominates every
    ``digits``-char hex prefix."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(fraction * 16**digits)
    return "g" if v >= 16**digits else format(v, f"0{digits}x")


def sample_predicate(
    key: Column, fraction: float, salt: str = "", digits: int = 8
) -> Column:
    """Boolean membership column; see module docstring for semantics."""
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, digits)
    return h < F.lit(_thr_hex(fraction, digits))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
    digits: int = 8,
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed by ``key_col``."""
    return df.where(sample_predicate(F.col(key_col), fraction, salt, digits))


def stratified_sample(
    df: DataFrame,
    fractions: "dict[str, float]",
    stratum_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
    digits: int = 8,
) -> DataFrame:
    """Per-stratum deterministic fractions (e.g. language rebalancing:
    keep 100% of low-resource languages, 5% of the dominant one). The
    per-stratum threshold is a CASE expression — still a shuffle-free
    codegen'd scan predicate; strata unseen in ``fractions`` fall back to
    ``default_fraction``."""
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, digits
    )
    thr = None
    for stratum, frac in sorted(fractions.items()):
        t = F.lit(_thr_hex(frac, digits))
        cond = F.col(stratum_col) == F.lit(stratum)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = F.lit(_thr_hex(default_fraction, digits))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return df.where(h < thr)


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    stratum_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row draws u from its content hash
    and ranks by u^(1/w) — computed as ln(u)/w, same ordering, stable
    numerics — keeping the top k (per stratum when ``stratum_col`` is
    given). Inclusion probability is proportional to weight; membership
    is a pure function of (key, salt, weights), reproducible across
    engines and partitionings like the unweighted sampler above.

    u = (hash53 + 1) / 2^52 from the md5 prefix — 13 hex chars = 52 bits,
    exact in a double. Rows with weight <= 0 are excluded (they can never
    win and ln(u)/w would flip sign). Global top-k plans as TakeOrdered
    (distributed partial top-k); per-stratum uses a window rank. Output
    adds ``sample_rank`` (1-based).

    Cross-engine caveat: the rank key ln(u)/w is a raw double, and log()
    is only 1-ulp-accurate in both JVM libm and DuckDB's — so ACROSS
    ENGINES a near-tie at the rank-k boundary could in principle order
    differently (the oracle gate's parity is probabilistic at ~1-ulp odds,
    not structural like the integerized comparisons elsewhere). WITHIN
    Spark the result is exactly deterministic regardless of partitioning:
    u is a pure function of the key, and (skey, key) is a total order.
    Integerizing the key would need a fixed-point scale covering ln(u)/w's
    unbounded dynamic range (w spans user space), so the double is kept
    and the caveat documented instead.
    """
    hv = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (hv + F.lit(1)).cast("double") / F.lit(float(16**13))
    skey = F.log(u) / F.col(weight_col)
    base = df.where(F.col(weight_col) > 0).withColumn("_skey", skey)
    if stratum_col is None:
        out = (
            base.orderBy(F.col("_skey").desc(), F.col(key_col))
            .limit(k)
            .withColumn(
                "sample_rank",
                F.row_number().over(
                    Window.orderBy(F.col("_skey").desc(), F.col(key_col))
                ),
            )
        )
    else:
        w = Window.partitionBy(stratum_col).orderBy(
            F.col("_skey").desc(), F.col(key_col)
        )
        out = base.withColumn("sample_rank", F.row_number().over(w)).where(
            F.col("sample_rank") <= k
        )
    return out.drop("_skey")
