"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()`` is seed-dependent AND partitioning-dependent — a retry, a
repartition, or a different engine yields a different subset, which is
poison for reproducible training corpora.  These operators instead gate each
row on a content hash: keep row iff ``md5(salt || key) < threshold(rate)``,
with the threshold a 32-hex-digit string.  Properties:

- deterministic: the subset is a pure function of (key, salt, rate) — stable
  across retries, partitionings, engines, and time;
- portable: any engine with md5 (Spark, DuckDB, Trino, Postgres) reproduces
  the EXACT same subset — which is how the driver oracle gates it;
- nested: for the same salt, the rate-r sample is a SUBSET of every
  rate-r' >= r sample (thresholds are ordered), so growing a training corpus
  from 1% to 10% only ADDS documents;
- uniform: md5 is uniform on [0, 2^128), so P(keep) = rate to ~1e-38, per
  key — duplicate keys are kept or dropped together (content-level
  sampling), which is usually what a dedup-aware pipeline wants;
- pure Catalyst: codegen'd md5 + string compare, zero Python, fully pushed
  parallelism; at 100 TB this adds one projection to the scan.

Reference analogue: the Heka monitor's probabilistic sampling of message
streams (heka_message_monitor.lua filter/sampling patterns) — re-expressed
as content-deterministic sampling, the variant a reproducible data pipeline
needs (SURVEY §2.6 filter/sampling).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hex_threshold(rate: float) -> str:
    """rate in [0, 1] -> 32-hex-digit md5 threshold string.  Rows whose
    md5 hex sorts strictly below it are kept; P(keep) = rate exactly up to
    the 2^-128 quantization.  rate >= 1 returns 'g' (lexically above every
    hex digest: keep everything)."""
    if rate >= 1.0:
        return "g"
    t = max(int(rate * (1 << 128)), 0)
    return format(t, "032x")


def sample_predicate(col, rate: float, salt: str = ""):
    """The Catalyst keep-predicate: md5(salt || col) < threshold."""
    digest = F.md5(F.concat(F.lit(salt), F.col(col) if isinstance(col, str) else col))
    return digest < F.lit(hex_threshold(rate))


def deterministic_sample(df: DataFrame, key_col: str, rate: float,
                         salt: str = "") -> DataFrame:
    """Keep ~rate of rows, deterministically by content hash of key_col.
    Same (key, salt, rate) -> same subset, on any engine, forever."""
    return df.filter(sample_predicate(key_col, rate, salt))


def stratified_sample(df: DataFrame, group_col: str, key_col: str,
                      rates: Mapping[str, float], default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-group deterministic sampling rates (e.g. downsample the dominant
    language, keep all of a rare one) — the standard training-mix rebalance.
    One codegen'd CASE over the SAME md5 digest for every group, so samples
    stay nested per group as rates change; groups absent from ``rates`` get
    ``default_rate``."""
    digest = F.md5(F.concat(F.lit(salt), F.col(key_col)))
    thr = F.lit(hex_threshold(default_rate))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(hex_threshold(r))).otherwise(thr)
    return df.filter(digest < thr)


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    group_cols=(), salt: str = "",
                    tiebreak_col: str | None = None) -> DataFrame:
    """Efraimidis–Spirakis (2006) weighted sampling WITHOUT replacement,
    deterministic and engine-portable: each key gets a uniform
    u = md5-derived fraction in (0, 1); its exponential race time
    e = -ln(u)/w makes the k smallest e per group a weighted sample with
    P(first pick = i) = w_i / Σw — importance-weighted corpus selection
    (sample ∝ quality score, length, dedup weight...).

    Same portability contract as deterministic_sample: u comes from the
    first 15 md5 hex digits (a 60-bit integer — every engine's
    int->double conversion rounds the SAME integer to the SAME double
    under round-to-nearest, and the /2^60 divisor is exact), so
    DuckDB/Trino reproduce the IDENTICAL sample with the same formula.
    Ranking uses ROUND(e, 9) (the tfidf_top_terms portability trick): two
    libm ln() implementations can differ in the last ulp, and ranking the
    unrounded double would let that flip the k-th-place cut; rounding
    first collapses last-ulp differences into exact ties that the
    tie-break resolves identically on both engines.  Pure Catalyst (md5 +
    window), zero Python; rows with non-positive or NULL weight are
    excluded (their race time is undefined).

    ``tiebreak_col`` (default: key_col) orders rows whose race times tie.
    Pass a UNIQUE NUMERIC column (a row id): two rows with byte-identical
    key text have identical u and e, and a string tie-break cannot order
    them — Spark would then rank by shuffle arrival (run-to-run
    nondeterministic) while the oracle ranks by its own scan order."""
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col))), 1, 15),
               16, 10).cast("double") / F.lit(float(16 ** 15))
    )
    e = -F.log(F.greatest(u, F.lit(1e-18))) / F.col(weight_col)
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.round(e, 9).asc(), F.col(tiebreak_col or key_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def split_assign(col, splits: Mapping[str, float], salt: str = ""):
    """Deterministic train/val/test split assignment — a Catalyst CASE over
    cumulative md5-hex thresholds (the sample_predicate machinery): each
    key lands in exactly one named split with probability equal to its
    fraction, the assignment is a pure function of (key, salt, split
    spec), and every engine that can md5 reproduces it byte-for-byte.
    Fractions must sum to 1 (+-1e-9); splits are laid out on the hex line
    in the mapping's iteration order, so pass an ordered mapping.

    NULL keys get a NULL split (no digest exists) — they would otherwise
    all fall silently into the last-named split, leaking a systematic
    subpopulation into evaluation."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    digest = F.md5(F.concat(F.lit(salt), F.col(col) if isinstance(col, str) else col))
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = digest < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    chain = last if expr is None else expr.otherwise(last)
    return F.when(digest.isNull(), F.lit(None).cast("string")).otherwise(chain)


def assign_splits(df: DataFrame, key_col: str, splits: Mapping[str, float],
                  salt: str = "", out_col: str = "split") -> DataFrame:
    """Add a deterministic split column (see split_assign)."""
    return df.withColumn(out_col, split_assign(key_col, splits, salt))
