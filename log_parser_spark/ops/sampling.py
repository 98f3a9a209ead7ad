"""Deterministic sampling / data-mixing operators.

A 100 TB pre-training pipeline mixes sources by ratio ("50% en, 10%
each other language").  Spark's df.sample/sampleBy is seeded but its
keep-decision is partition-dependent (Bernoulli over a per-partition
RNG stream), so results change with partitioning and cannot be
reproduced by another engine.  These operators instead hash a KEY
column: keep a row iff the first 8 hex chars of md5(key || ':' ||
seed) fall under the fraction's threshold.  Properties:

- map-only projection: zero shuffles, trivially scales
- partitioning-independent and engine-independent: any system with
  md5 reproduces the exact same sample (the DuckDB oracle does)
- per-key stable: the same document is kept in every run / engine
- disjoint seeds give independent samples (new seed, new hash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32-bit resolution: fraction granularity 2**-32


def _threshold_hex(fraction: float) -> str:
    """8-hex-char keep threshold; compare is LEXICOGRAPHIC against the
    md5 prefix, so the result must stay 8 chars — except the full-keep
    case: a fraction that rounds to 16^8 returns 'g', which sorts above
    every hex digit and therefore keeps 100% (the naive 9-char
    '100000000' sorts BELOW any hash not starting with '0' and would
    silently keep ~1/16 of a fraction=1.0 stratum)."""
    f = min(max(fraction, 0.0), 1.0)
    scaled = int(round(f * (16 ** _HEX_DIGITS)))
    if scaled >= 16 ** _HEX_DIGITS:
        return "g"
    return format(scaled, f"0{_HEX_DIGITS}x")


def sample_hash_col(key: str | Column, seed: int = 42) -> Column:
    """The 8-hex-char decision hash for a key (exposed for mirroring)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat(k.cast("string"), F.lit(f":{seed}"))),
        1, _HEX_DIGITS)


def deterministic_sample(df: DataFrame, key: str, fraction: float,
                         seed: int = 42) -> DataFrame:
    """Keep ~fraction of rows, decided per key hash (see module doc)."""
    if fraction >= 1.0:
        return df
    return df.filter(sample_hash_col(key, seed) < _threshold_hex(fraction))


def temperature_mix_weights(df: DataFrame, strata_col: str,
                            n_tokens_col: str, alpha: float = 0.3,
                            token_budget: float | None = None
                            ) -> DataFrame:
    """Temperature-based mixing weights — the op that COMPUTES the
    fractions `stratified_sample` consumes (the published multilingual
    / multi-source recipe: sample stratum i with probability
    p_i = n_i^alpha / sum_j n_j^alpha, alpha in (0, 1] flattening the
    head so low-resource strata survive).

    Per stratum: doc and token counts, the normalized weight, and —
    when ``token_budget`` is given — the deterministic sampling
    fraction f_i = budget * p_i / n_i that realizes the mix
    (capped at 1.0: a stratum needing upsampling reports fraction 1.0
    and its shortfall is visible as weight * budget > n_tokens).

    Shape: one groupBy on the stratum column (map-side combinable);
    the normalization total is a 1-row broadcast crossJoin over the
    per-stratum aggregate (strata are few by construction) — no
    global window, no driver-side math."""
    agg = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_col).cast("long").alias("n_tokens"))
    agg = agg.withColumn(
        "_w", F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)))
    tot = agg.agg(F.sum("_w").alias("_tw"))
    out = (agg.crossJoin(F.broadcast(tot))
           .withColumn("weight", F.round(F.col("_w") / F.col("_tw"), 6)))
    if token_budget is not None:
        # empty strata (n_tokens == 0, weight 0) must report fraction
        # 0.0, not 1.0: the unguarded divide yields NULL and Spark's
        # null-skipping least(1.0, NULL) = 1.0 — a misleading planner
        # row for a stratum there is nothing to draw from
        frac = F.when(
            F.col("n_tokens") > 0,
            F.least(
                F.lit(1.0),
                F.lit(float(token_budget)) * (F.col("_w") / F.col("_tw"))
                / F.col("n_tokens").cast("double"))
        ).otherwise(F.lit(0.0))
        out = out.withColumn("sample_fraction", F.round(frac, 6))
    return out.drop("_w", "_tw")


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float], key: str,
                      default_fraction: float = 0.0,
                      seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling (the data-mixing primitive):
    each stratum keeps its own fraction; strata absent from the map
    keep ``default_fraction``.  Single map-only filter — the fraction
    lookup compiles to a CASE chain, never a join."""
    thresh = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(_threshold_hex(frac))).otherwise(thresh)
    return df.filter(sample_hash_col(key, seed) < thresh)
