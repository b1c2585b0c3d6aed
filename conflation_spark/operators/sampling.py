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

from pyspark.sql import Column, DataFrame
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
