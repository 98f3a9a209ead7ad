"""J11 enrichment joins (north rule): event-type dictionary, lang/domain
dimension, severity classifier — all tiny dims applied as broadcast hash
joins onto the big routed streams.  Skewed domains are safe: the dims
are broadcast, so no shuffle keys on domain ever occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_EVENT_TYPES = [
    # (event_type, flow, is_start, sink) — events.py:27-50,113-119
    ("flush_started", "Flush", True, "flush_events"),
    ("flush_finished", "Flush", False, "flush_events"),
    ("compaction_started", "Compaction", True, "compactions"),
    ("compaction_finished", "Compaction", False, "compactions"),
    ("table_file_creation", None, None, "files"),
    ("table_file_deletion", None, None, "files"),
    ("trivial_move", None, None, "events_misc"),
    ("recovery_started", "Recovery", True, "events_misc"),
    ("recovery_finished", "Recovery", False, "events_misc"),
    ("ingest_finished", None, None, "events_misc"),
    ("blob_file_creation", None, None, "events_misc"),
    ("blob_file_deletion", None, None, "events_misc"),
]

_SEVERITIES = [
    # (warn_type, category, severity) — warnings_mngr.py:25-45
    ("WARN", "Write-Delay", 2),
    ("WARN", "Write-Stop", 3),
    ("WARN", "Other", 1),
    ("ERROR", "Write-Delay", 4),
    ("ERROR", "Write-Stop", 5),
    ("ERROR", "Other", 3),
    ("FATAL", "Write-Delay", 6),
    ("FATAL", "Write-Stop", 6),
    ("FATAL", "Other", 5),
]


def event_type_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _EVENT_TYPES, "event_type string, flow string, is_start boolean, "
                      "sink string")


def severity_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _SEVERITIES, "warn_type string, category string, severity int")


def domain_dim(spark: SparkSession) -> DataFrame:
    from log_parser_spark.corpus import _DOMAINS
    tiers = ["hot", "warm", "mid", "cool", "cold", "tiny"]
    rows = [(d, lang, tiers[min(i, len(tiers) - 1)])
            for i, (d, _w, lang) in enumerate(_DOMAINS)]
    return spark.createDataFrame(rows, "domain string, lang string, "
                                       "tier string")


def with_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "domain", F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1))


def enrich_events(events: DataFrame, spark: SparkSession) -> DataFrame:
    """events + event-type dictionary + domain dim (both broadcast)."""
    etd = event_type_dim(spark)
    dd = domain_dim(spark)
    out = events.join(F.broadcast(etd), "event_type", "left")
    out = with_domain(out).join(F.broadcast(dd), "domain", "left")
    return out


def enrich_warnings(warnings_classified: DataFrame,
                    spark: SparkSession) -> DataFrame:
    """classified warnings + severity dim (broadcast)."""
    sd = severity_dim(spark)
    return warnings_classified.join(
        F.broadcast(sd), ["warn_type", "category"], "left")
