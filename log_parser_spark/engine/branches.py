"""Per-kind branch DataFrames over the records table.

Each branch is a plain declarative select/filter so Catalyst prunes the
records scan to exactly the columns a sink needs; all casts happen here
(raw strings live in the records table)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_parser_spark.engine.schema import EVENT_PAYLOAD_SCHEMA

_D = "double"
_L = "long"


def _attr(c, name, typ=None):
    col = F.element_at(F.col(c), F.lit(name))
    return col.cast(typ) if typ else col


def counters(records: DataFrame) -> DataFrame:
    """(url, ts, name, value, seq) — counter time series (counters.py:72-102)."""
    return records.filter(F.col("kind") == "counter").select(
        "url", "ts", "name", "value", "seq")


def histograms(records: DataFrame) -> DataFrame:
    """Typed histogram samples incl. derived fields (counters.py:104-161)."""
    r = records.filter(F.col("kind") == "histogram")
    return r.select(
        "url", "ts", "name", "seq",
        _attr("attrs", "P50", _D).alias("p50"),
        _attr("attrs", "P95", _D).alias("p95"),
        _attr("attrs", "P99", _D).alias("p99"),
        _attr("attrs", "P100", _D).alias("p100"),
        _attr("attrs", "Count", _L).alias("count"),
        _attr("attrs", "Sum", _L).alias("sum"),
        _attr("attrs", "Average", _D).alias("average"),
        _attr("attrs", "Interval Count", _L).alias("interval_count"),
        _attr("attrs", "Interval Sum", _L).alias("interval_sum"),
    )


def events(records: DataFrame) -> DataFrame:
    """Typed events with the fixed payload fields parsed JVM-side."""
    r = records.filter(F.col("kind") == "event")
    return r.select(
        "url", "ts", "seq", "event_type", "job_id", "cf", "time_micros",
        "payload_json",
        _attr("attrs", "wal_id", _L).alias("wal_id"),
        F.from_json("payload_json", EVENT_PAYLOAD_SCHEMA).alias("p"),
    )


def options(records: DataFrame) -> DataFrame:
    """(url, section, cf, name, value) — db_options.py:466-479 layout."""
    return records.filter(F.col("kind") == "option").select(
        "url", _attr("attrs", "section").alias("section"), "cf",
        F.col("name").alias("option"), F.col("msg").alias("value"), "seq")


def warnings(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "warning").select(
        "url", "ts", "warn_type", "code_pos", "msg", "seq")


def cf_registry(records: DataFrame) -> DataFrame:
    """Per-url column-family registry (cfs_infos.py:26-94)."""
    return records.filter(F.col("kind") == "cf_found").select(
        "url", "cf", F.col("name").alias("discovery"),
        (_attr("attrs", "auto_generated") == "True").alias("auto_generated"),
        (_attr("attrs", "has_options") == "True").alias("has_options"),
        _attr("attrs", "cf_id", _L).alias("cf_id"), "seq")


def metadata(records: DataFrame) -> DataFrame:
    """One row per url: product/version/git/session/start/end."""
    r = records.filter(F.col("kind") == "metadata")
    # min_by(seq) = first occurrence in document order (deterministic;
    # rolled logs carry one metadata block per session, first wins —
    # log_file.py metadata comes from the first session's header)
    return r.groupBy("url").pivot(
        "name", ["product_name", "version", "git_hash", "db_session_id",
                 "start_time", "end_time"]).agg(F.min_by("msg", "seq"))


def comp_stats(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "comp_stats").select(
        "url", "ts", "cf", F.col("name").alias("level_key"), "attrs",
        "payload_json", "seq")


def db_stats_stalls(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "db_stats_stall").select(
        "url", "ts",
        _attr("attrs", "interval_duration_ms", _L).alias("interval_duration_ms"),
        _attr("attrs", "interval_percent", _D).alias("interval_percent"),
        _attr("attrs", "cumulative_duration_ms", _L).alias("cumulative_duration_ms"),
        _attr("attrs", "cumulative_percent", _D).alias("cumulative_percent"),
        "seq")


def cumulative_writes(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "cumulative_writes").select(
        "url", "ts",
        _attr("attrs", "num_writes", _L).alias("num_writes"),
        _attr("attrs", "num_keys", _L).alias("num_keys"),
        _attr("attrs", "ingest", _L).alias("ingest"),
        _attr("attrs", "ingest_rate_mbps", _D).alias("ingest_rate_mbps"),
        "seq")


def cf_stalls(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "cf_stalls").select(
        "url", "ts", "cf", F.col("name").alias("reason"),
        F.col("value").alias("count"), "seq")


def read_latency(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "read_latency").select(
        "url", "ts", "cf", F.col("value").alias("level"),
        _attr("attrs", "count", _L).alias("count"),
        _attr("attrs", "average", _D).alias("average"),
        _attr("attrs", "std_dev", _D).alias("std_dev"),
        _attr("attrs", "min", _L).alias("min"),
        _attr("attrs", "median", _D).alias("median"),
        _attr("attrs", "max", _L).alias("max"), "seq")


def blob_stats(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "blob_stats").select(
        "url", "ts", "cf",
        _attr("attrs", "file_count", _L).alias("file_count"),
        _attr("attrs", "total_size", _L).alias("total_size"),
        _attr("attrs", "garbage_size", _L).alias("garbage_size"),
        _attr("attrs", "space_amp", _D).alias("space_amp"), "seq")


def block_cache(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "block_cache").select(
        "url", "ts", F.col("name").alias("cache_id"), "cf",
        _attr("attrs", "row").alias("row"),
        _attr("attrs", "role").alias("role"),
        _attr("attrs", "count", _L).alias("count"),
        _attr("attrs", "size", _L).alias("size"),
        _attr("attrs", "portion").alias("portion"),
        _attr("attrs", "capacity", _L).alias("capacity"),
        _attr("attrs", "usage", _L).alias("usage"), "seq")


def prefinish(records: DataFrame) -> DataFrame:
    """Compaction pre-finish textual stats lines (compactions.py:19-30)."""
    return records.filter(F.col("kind") == "prefinish").select(
        "url", "ts", "cf",
        _attr("attrs", "read_rate_mbps", _D).alias("read_rate_mbps"),
        _attr("attrs", "write_rate_mbps", _D).alias("write_rate_mbps"),
        _attr("attrs", "read_write_amplify", _D).alias("read_write_amplify"),
        _attr("attrs", "write_amplify", _D).alias("write_amplify"),
        _attr("attrs", "records_in", _L).alias("records_in"),
        _attr("attrs", "records_dropped", _L).alias("records_dropped"),
        "seq")


def quarantine(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "quarantine").select(
        "url", "ts", _attr("attrs", "reason").alias("reason"), "msg", "seq")


def unparsed(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "unparsed").select(
        "url", "ts", "msg", "seq")
