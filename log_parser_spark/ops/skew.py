"""Skew handling (north rule): salted two-phase aggregation and salted
repartition for Zipf-skewed keys (e.g. the hot domain holding most
pages).

AQE's skew-join splitting (enabled session-wide) covers joins; these
helpers cover aggregations/repartitions where one key dominates:
  phase 1: groupBy(key, salt) — the hot key's rows spread over `salt_n`
           reducers instead of one
  phase 2: groupBy(key)       — combine the (at most salt_n) partials
Exact for algebraic aggregates (count/sum/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_n: int = 16,
              col_name: str = "_salt") -> DataFrame:
    """Round-robin per-row salt from monotonically_increasing_id.

    NOT a hash of the row content: a hot key typically consists of
    IDENTICAL duplicate rows (the common crawl case), which a content
    hash would send to the SAME reducer, defeating the salt entirely.
    The monotonic id cycles 0..salt_n-1 within each partition, so
    identical rows spread evenly.  Salt assignment never affects the
    exactness of the two-phase aggregation (each row contributes once
    whatever its salt), and is deterministic for a fixed input
    partitioning."""
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(salt_n)))


def salted_repartition(df: DataFrame, key: str | Column, n_partitions: int,
                       salt_n: int = 16) -> DataFrame:
    """repartition on (key, salt): a hot key spreads over salt_n
    partitions instead of hot-spotting one."""
    k = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df, salt_n)
    return salted.repartition(n_partitions, k, F.col("_salt")).drop("_salt")


def salted_count(df: DataFrame, keys: list[str],
                 salt_n: int = 16) -> DataFrame:
    """Exact groupBy(keys).count() via two-phase salted aggregation."""
    salted = with_salt(df, salt_n)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("n"))


def salted_sum(df: DataFrame, keys: list[str], value_col: str,
               salt_n: int = 16) -> DataFrame:
    """Exact groupBy(keys).sum(value) via two-phase salted aggregation."""
    salted = with_salt(df, salt_n)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value_col).alias("_partial"))
    return partial.groupBy(*keys).agg(
        F.sum("_partial").alias(f"sum_{value_col}"))
