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
    """Flagship: pages -> mapInPandas parse -> route -> event histogram."""
    try:
        from log_parser_spark.queries import log_event_histogram
        df = log_event_histogram(spark, "/root/testdata/sf0.001")
        df.take(1)  # force corpus availability check
        return df
    except Exception:
        from log_parser_spark.queries import q1_pricing_summary
        return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
