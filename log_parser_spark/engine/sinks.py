"""Routed sink DataFrames (SURVEY §2.1 S3-S8).

Each sink is the *long/normalized* relational form of one reference CSV
family; the cell set equals the reference CSV cell set exactly (the
driver-side renderers in ``csv_render`` reproduce the bytes).  Keeping
sinks long keeps them scalable: a pivot to wide per-url CSV is a
report-edge operation, not a cluster operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_parser_spark.engine import joins


def counters_sink(counters: DataFrame) -> DataFrame:
    """S3: zero-filled (url, ts, name, value) grid over the unified
    per-url time axis x non-all-zero counters (csv_outputter.py:25-72).

    first_seen orders columns by appearance (counters.py:42-45).

    ONE scan of the branch: Catalyst has no cross-join subtree CSE, so
    deriving nonzero / vals / times as three frames over the raw branch
    repeats the 23M-row records scan + extract three times inside the
    one write job (measured ~3x the sink's whole cost at 96k pages).
    Instead the (url, ts, name) aggregate carries max(value) and
    min(seq) alongside the first-seen cell — max of per-group maxes ==
    raw max and min of per-group mins == raw min, so nonzero/first_seen
    semantics are EXACTLY unchanged — and a lazy localCheckpoint
    barrier on that tiny aggregate (~5600x smaller than the branch)
    lets all three consumers share one materialization (the PLANS.md
    barrier pattern; plan pinned by test_grid_sinks_axis_agg_collapses).

    Known small leak: the lazily-checkpointed aggregate's RDD blocks
    stay persisted for the session's lifetime (the sink returns a
    DataFrame, so there is no post-write hook here to unpersist them).
    Each pipeline bucket/epoch leaves two such tiny cached aggregates
    (this sink + histograms_sink) behind; bounded and harmless for
    batch runs, but a VERY long-lived session re-running thousands of
    buckets should spark.catalog.clearCache() between epochs."""
    vals_full = (counters.groupBy("url", "ts", "name").agg(
        F.min_by("value", "seq").alias("value"),
        F.max("value").alias("_mx"),
        F.min("seq").alias("_minseq"))
        .localCheckpoint(eager=False))
    nonzero = (vals_full.groupBy("url", "name")
               .agg(F.max("_mx").alias("mx"),
                    F.min("_minseq").alias("first_seen"))
               .filter(F.col("mx") > 0)
               .select("url", "name", "first_seen"))
    vals = vals_full.select("url", "ts", "name", "value")
    times = vals_full.select("url", "ts").distinct()
    grid = times.join(nonzero, "url")
    return (grid.join(vals, ["url", "ts", "name"], "left")
            .na.fill({"value": 0})
            .select("url", "ts", "name", "value", "first_seen"))


_HIST_COLS = ["p50", "p95", "p99", "p100", "count", "sum", "average",
              "interval_count", "interval_sum"]


def histograms_sink(histograms: DataFrame) -> DataFrame:
    """S4 (long/tools layout): one row per (url, ts, histogram) over the
    unified per-url histogram time axis; missing samples zero-filled,
    `present` records whether the sample existed (the tools CSV emits
    truncated rows for exhausted counters — csv_outputter.py:174-193)."""
    # one scan + lazy checkpoint barrier on the tiny aggregate — same
    # exact-semantics restructure as counters_sink (max of per-group
    # maxes == raw max; min of per-group mins == raw min)
    vals_full = (histograms.groupBy("url", "ts", "name").agg(
        *[F.min_by(c, "seq").alias(c) for c in _HIST_COLS],
        F.lit(True).alias("present"),
        F.max("count").alias("_mx"),
        F.min("seq").alias("_minseq"))
        .localCheckpoint(eager=False))
    nonzero = (vals_full.groupBy("url", "name")
               .agg(F.max("_mx").alias("mx"),
                    F.min("_minseq").alias("first_seen"))
               .filter(F.col("mx") > 0)
               .select("url", "name", "first_seen"))
    vals = vals_full.select("url", "ts", "name", *_HIST_COLS, "present")
    times = vals_full.select("url", "ts").distinct()
    grid = times.join(nonzero, "url")
    out = grid.join(vals, ["url", "ts", "name"], "left")
    return out.na.fill({c: 0 for c in _HIST_COLS}).na.fill(
        {"present": False}).select(
        "url", "ts", "name", *_HIST_COLS, "present", "first_seen")


def compaction_stats_sink(comp_stats: DataFrame) -> DataFrame:
    """S5: flattened {time: {cf: {level: cols}}} rows
    (csv_outputter.py:198-220)."""
    return comp_stats.select("url", "ts", "cf", "level_key", "attrs",
                             "payload_json", "seq")


def flushes_sink(events: DataFrame, cf_registry: DataFrame) -> DataFrame:
    """S7: flush flow pairs for non-auto-generated cfs
    (csv_outputter.py:223-266,427-428; cfs chosen at log_parser.py:231).

    cf_rank (the cf's discovery seq) rides along because the reference
    CSV breaks start-time ties by cf-REGISTRY order: it concatenates
    per-cf pair lists in registry order and stable-sorts on start time
    (get_flow_events_csv + get_all_flow_events)."""
    cfs = (cf_registry.filter(~F.col("auto_generated"))
           .groupBy("url", "cf").agg(F.min("seq").alias("cf_rank")))
    pairs = joins.flow_pairs(events, "Flush")
    out = pairs.join(cfs, ["url", "cf"], "inner")
    return out.select(
        "url", "cf", "cf_rank", "job_id", "start_ts", "finish_ts",
        "start_seq",
        "duration_ms", "wal_id",
        F.col("start_p.flush_reason").alias("flush_reason"),
        F.col("start_p.num_entries").alias("num_entries"),
        F.col("start_p.num_deletes").alias("num_deletes"),
        F.col("start_p.num_memtables").alias("num_memtables"),
        F.col("start_p.total_data_size").alias("total_data_size"),
        "start_payload", "finish_payload")


def compactions_sink(events: DataFrame, prefinish: DataFrame) -> DataFrame:
    """S6: finished compaction jobs w/ pre-finish stats
    (csv_outputter.py:342-424)."""
    jobs = joins.compaction_jobs(events, prefinish)
    return jobs.select(
        "url", "cf", "job_id", "start_ts", "finish_ts", "start_seq",
        "duration_ms",
        F.col("start_p.compaction_reason").alias("compaction_reason"),
        F.col("start_p.input_data_size").alias("input_data_size"),
        F.col("finish_p.compaction_time_micros").alias("compaction_time_micros"),
        F.col("finish_p.compaction_time_cpu_micros").alias(
            "compaction_time_cpu_micros"),
        F.col("finish_p.output_level").alias("output_level"),
        F.col("finish_p.num_output_files").alias("num_output_files"),
        F.col("finish_p.total_output_size").alias("total_output_size"),
        "records_in", "records_dropped", "read_rate_mbps", "write_rate_mbps",
        "read_write_amplify", "write_amplify",
        "start_payload", "finish_payload")


def files_sink(events: DataFrame) -> DataFrame:
    """S8: per-file creation props + deletion status
    (csv_outputter.py:431-493)."""
    files = joins.file_lifecycle(events)
    return files.select(
        "url", "file_number", "seq", "status", "created_ts", "deleted_ts",
        "cf", "job_id",
        F.col("p.file_size").alias("file_size"),
        F.col("p.table_properties.data_size").alias("data_size"),
        F.col("p.table_properties.index_size").alias("index_size"),
        F.col("p.table_properties.filter_size").alias("filter_size"),
        F.col("p.table_properties.filter_policy").alias("filter_policy"),
        F.col("p.table_properties.num_entries").alias("num_entries"),
        F.col("p.table_properties.raw_key_size").alias("raw_key_size"),
        F.col("p.table_properties.raw_value_size").alias("raw_value_size"),
        F.col("p.table_properties.compression").alias("compression"),
        "creation_payload")


def warnings_sink(warnings: DataFrame, cf_registry: DataFrame) -> DataFrame:
    """J9 + A21 base: warnings classified (Write-Delay / Write-Stop /
    Other, warnings_mngr.py:76-93) and attributed to a cf by intersecting
    bracketed names in the message with the url's non-auto-generated cf
    names (warnings_mngr.py:95-106; utils.py:591-611)."""
    classified = warnings.withColumn(
        "category",
        F.when(F.col("msg").rlike(r"\[[\w\]]*\]\s*Stalling writes"),
               "Write-Delay")
        .when(F.col("msg").rlike(r"\[[\w\]]*\]\s*Stopping writes"),
              "Write-Stop")
        .otherwise("Other"))

    # candidate bracketed tokens in the message
    cand = classified.withColumn(
        "cands",
        F.array_distinct(
            F.expr(r"regexp_extract_all(msg, '\\[([\\w\\]]*)\\]', 1)")))

    cfs = (cf_registry.filter(~F.col("auto_generated"))
           .groupBy("url").agg(F.collect_set("cf").alias("cfs")))

    joined = cand.join(cfs, "url", "left")
    hits = F.array_intersect(
        F.col("cands"), F.coalesce(F.col("cfs"), F.array()))
    return joined.withColumn(
        "cf",
        F.when(F.size(hits) == 1, F.element_at(hits, 1))
        .otherwise(F.lit("DB_WIDE"))).drop("cands", "cfs")
