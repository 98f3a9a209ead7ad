"""Aggregate layer (SURVEY §2.4 A1-A23): the calc_utils/cache_utils
computations re-expressed as per-url groupBy/window rollups.

Every function takes branch DataFrames and returns a DataFrame keyed by
url (one row per url, or per url x sub-key) — the building blocks of the
parsed_json summary sink (S9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_parser_spark.engine import joins


# -- A1/A2: first/last counter & histogram values ------------------------

def counter_first_last(counters: DataFrame) -> DataFrame:
    """calc_utils-style last/first per (url, counter) (counters.py:206-232)."""
    return counters.groupBy("url", "name").agg(
        F.min_by("value", "seq").alias("first_value"),
        F.max_by("value", "seq").alias("last_value"),
        F.min_by("ts", "seq").alias("first_ts"),
        F.max_by("ts", "seq").alias("last_ts"),
        F.count("*").alias("n_samples"))


def last_histogram_entry(histograms: DataFrame,
                         non_zero: bool = False) -> DataFrame:
    """counters.py:254-264."""
    h = histograms
    if non_zero:
        h = h.filter(F.col("count") > 0)
    return h.groupBy("url", "name").agg(
        F.max_by(F.struct("p50", "p95", "p99", "p100", "count", "sum",
                          "average"), "seq").alias("last"))


# -- A5/A6: user-opers and seek stats ------------------------------------

_USER_OPERS = ["rocksdb.number.keys.written", "rocksdb.number.keys.read",
               "rocksdb.number.db.seek"]


def user_opers_stats(counters: DataFrame) -> DataFrame:
    """calc_utils.py:315-348: last values of write/read/seek counters +
    percentages."""
    fl = counter_first_last(
        counters.filter(F.col("name").isin(_USER_OPERS)))
    p = fl.groupBy("url").pivot("name", _USER_OPERS).agg(
        F.first("last_value"))
    p = p.na.fill(0)
    total = sum(F.col(f"`{c}`") for c in _USER_OPERS)
    out = p.withColumn("num_total", total.cast("long"))
    for c, alias in zip(_USER_OPERS, ["num_written", "num_read", "num_seek"]):
        out = out.withColumn(alias, F.col(f"`{c}`").cast("long"))
        out = out.withColumn(
            f"percent_{alias[4:]}",
            F.round(F.when(F.col("num_total") > 0,
                           100.0 * F.col(alias) / F.col("num_total"))
                    .otherwise(0.0), 6))
    return out.select("url", "num_written", "num_read", "num_seek",
                      "num_total", "percent_written", "percent_read",
                      "percent_seek")


_SEEK_COUNTERS = ["rocksdb.number.db.seek", "rocksdb.number.db.seek.found",
                  "rocksdb.number.db.next", "rocksdb.number.db.prev"]

_TS_FMT = "yyyy/MM/dd-HH:mm:ss.SSSSSS"


def seek_stats(counters: DataFrame) -> DataFrame:
    """calc_utils.py:935-1007: (last - first) deltas for seek counters."""
    fl = counter_first_last(
        counters.filter(F.col("name").isin(_SEEK_COUNTERS)))
    return (fl.withColumn("delta",
                          F.col("last_value") - F.col("first_value"))
            .groupBy("url").pivot("name", _SEEK_COUNTERS)
            .agg(F.first("delta")).na.fill(0))


def seek_stats_full(counters: DataFrame, histograms: DataFrame) -> DataFrame:
    """A6 complete (calc_utils.py:946-1007): counter deltas + avg seek
    range + seeks/sec over the seek counter's time span + avg latency
    from the LAST seek-latency histogram entry (rate and latency are 0
    unless that entry exists with Count > 0, like the reference).
    One row per url with seek activity (num_seeks != 0)."""
    deltas = (counters.filter(F.col("name").isin(_SEEK_COUNTERS))
              .groupBy("url", "name")
              .agg((F.max_by("value", "seq") - F.min_by("value", "seq"))
                   .alias("delta"),
                   F.min_by("ts", "seq").alias("first_ts"),
                   F.max_by("ts", "seq").alias("last_ts")))
    p = deltas.groupBy("url").pivot("name", _SEEK_COUNTERS).agg(
        F.first("delta")).na.fill(0)
    span = (deltas.filter(F.col("name") == "rocksdb.number.db.seek")
            .select("url",
                    (F.unix_micros(F.to_timestamp("last_ts", _TS_FMT))
                     - F.unix_micros(F.to_timestamp("first_ts", _TS_FMT)))
                    .alias("span_us")))
    hist = (histograms.filter(F.col("name") == "rocksdb.db.seek.micros")
            .groupBy("url")
            .agg(F.max_by(F.struct("count", "average"), "seq").alias("h")))

    out = (p.join(span, "url", "inner").join(hist, "url", "left")
           .withColumnRenamed("rocksdb.number.db.seek", "num_seeks")
           .withColumnRenamed("rocksdb.number.db.seek.found",
                              "num_found_seeks")
           .withColumnRenamed("rocksdb.number.db.next", "num_nexts")
           .withColumnRenamed("rocksdb.number.db.prev", "num_prevs")
           .filter(F.col("num_seeks") != 0))
    has_hist = F.col("h").isNotNull() & (F.col("h.count") > 0)
    return out.select(
        "url", "num_seeks", "num_found_seeks", "num_nexts", "num_prevs",
        F.round((F.col("num_prevs") + F.col("num_nexts"))
                / F.col("num_seeks"), 6).alias("avg_seek_range_size"),
        F.round(F.when(has_hist & (F.col("span_us") > 0),
                       F.col("num_seeks")
                       / (F.col("span_us") / 1_000_000.0))
                .otherwise(0.0), 6).alias("avg_seek_rate_per_second"),
        F.round(F.when(has_hist, F.col("h.average")).otherwise(0.0), 6)
        .alias("avg_seek_latency_us"))


# -- A7: table-creation stats per cf --------------------------------------

def table_creation_stats(events: DataFrame) -> DataFrame:
    """calc_utils.py:217-249 via table_file_creation payload fields."""
    c = events.filter(F.col("event_type") == "table_file_creation")
    tp = F.col("p.table_properties")
    return c.groupBy("url", "cf").agg(
        F.count("*").alias("num_created"),
        F.sum(tp["num_entries"]).alias("total_num_entries"),
        F.sum(tp["raw_key_size"]).alias("total_keys_sizes"),
        F.sum(tp["raw_value_size"]).alias("total_values_sizes"),
        F.round(F.avg(tp["num_entries"]), 6).alias("avg_num_entries"))


# -- A8: delete-opers stats ------------------------------------------------

def delete_opers_stats(events: DataFrame) -> DataFrame:
    """calc_utils.py:252-312: flushed entries vs deletes per url."""
    fs = events.filter(F.col("event_type") == "flush_started")
    return fs.groupBy("url").agg(
        F.sum("p.num_entries").alias("total_num_flushed_entries"),
        F.sum("p.num_deletes").alias("total_num_deletes")
    ).withColumn(
        "percent_deletes",
        F.round(F.when(F.col("total_num_flushed_entries") > 0,
                       100.0 * F.col("total_num_deletes")
                       / F.col("total_num_flushed_entries")).otherwise(0.0),
                6))


# -- A9: flush stats per (cf, reason) with size buckets ---------------------

def flush_stats(events: DataFrame) -> DataFrame:
    """calc_utils.py:589-674: per (url, cf, flush_reason): counts,
    bucketed write sizes, min/max duration from the paired flow."""
    pairs = joins.flow_pairs(events, "Flush")
    sz = F.col("start_p.total_data_size")
    bucket = F.when(sz < 2 * 1024**2, "0-2MB") \
        .when(sz < 10 * 1024**2, "2-10MB") \
        .when(sz < 32 * 1024**2, "10-32MB") \
        .when(sz < 64 * 1024**2, "32-64MB") \
        .otherwise(">64MB")
    base = pairs.select(
        "url", "cf", F.col("start_p.flush_reason").alias("flush_reason"),
        sz.alias("data_size"), bucket.alias("size_bucket"),
        F.col("start_p.num_memtables").alias("num_memtables"),
        "duration_ms")
    return base.groupBy("url", "cf", "flush_reason").agg(
        F.count("*").alias("n_flushes"),
        F.sum("data_size").alias("total_data_size"),
        F.min("duration_ms").alias("min_duration_ms"),
        F.max("duration_ms").alias("max_duration_ms"),
        F.sum("num_memtables").alias("total_num_memtables"))


def flush_size_histogram(events: DataFrame) -> DataFrame:
    """The bucketed size histogram as a pivot (A9's bucket component)."""
    pairs = joins.flow_pairs(events, "Flush")
    sz = F.col("start_p.total_data_size")
    bucket = F.when(sz < 2 * 1024**2, "lt_2mb") \
        .when(sz < 10 * 1024**2, "mb_2_10") \
        .when(sz < 32 * 1024**2, "mb_10_32") \
        .when(sz < 64 * 1024**2, "mb_32_64") \
        .otherwise("gt_64mb")
    return (pairs.select("url", "cf", bucket.alias("size_bucket"))
            .groupBy("url", "cf")
            .pivot("size_bucket",
                   ["lt_2mb", "mb_2_10", "mb_10_32", "mb_32_64", "gt_64mb"])
            .agg(F.count(F.lit(1))).na.fill(0))


# -- A10: event histogram ---------------------------------------------------

def event_histogram(events: DataFrame) -> DataFrame:
    """calc_utils.py:576-586: count per (url, cf, event_type)."""
    return events.groupBy("url", "cf", "event_type").agg(
        F.count("*").alias("n"))


# -- A11/A12: compaction stats per cf ----------------------------------------

def compaction_stats_per_cf(events: DataFrame,
                            prefinish: DataFrame) -> DataFrame:
    """calc_utils.py:677-755."""
    jobs = joins.compaction_jobs(events, prefinish)
    return jobs.groupBy("url", "cf").agg(
        F.count("*").alias("n_compactions"),
        F.min("read_rate_mbps").alias("min_read_rate_mbps"),
        F.max("read_rate_mbps").alias("max_read_rate_mbps"),
        F.min("write_rate_mbps").alias("min_write_rate_mbps"),
        F.max("write_rate_mbps").alias("max_write_rate_mbps"),
        F.max("duration_ms").alias("max_duration_ms"),
        F.sum("records_in").alias("total_records_in"))


def largest_compaction_input(events: DataFrame) -> DataFrame:
    """calc_utils.py:677-685: max over start events' input_data_size."""
    return (events.filter(F.col("event_type") == "compaction_started")
            .groupBy("url")
            .agg(F.max("p.input_data_size").alias(
                "largest_compaction_size_bytes")))


# -- A13/A14/A15: level-stats first/last + db size + growth ------------------

def comp_stats_first_last(comp_stats: DataFrame) -> DataFrame:
    """First & last dump per (url, cf, level_key) (stats_mngr.py:410-451)."""
    size = F.element_at("attrs", "size_bytes").cast("long")
    files = F.element_at("attrs", "Num-Files").cast("long")
    base = comp_stats.select("url", "ts", "cf", "level_key", "seq",
                             size.alias("size_bytes"),
                             files.alias("num_files"))
    return base.groupBy("url", "cf", "level_key").agg(
        F.min_by(F.struct("ts", "size_bytes", "num_files"), "seq")
        .alias("first"),
        F.max_by(F.struct("ts", "size_bytes", "num_files"), "seq")
        .alias("last"))


def db_size_start_end(comp_stats: DataFrame) -> DataFrame:
    """calc_utils.py:31-71: sum of SUM-line size_bytes over cfs of the
    first/last dump."""
    fl = comp_stats_first_last(comp_stats).filter(
        F.col("level_key") == "SUM")
    return fl.groupBy("url").agg(
        F.sum("first.size_bytes").alias("db_size_bytes_at_start"),
        F.sum("last.size_bytes").alias("db_size_bytes_at_end"))


def growth_per_cf_level(comp_stats: DataFrame) -> DataFrame:
    """calc_utils.py:101-214: (start_size, start_files, end_size,
    end_files) per (url, cf, level)."""
    fl = comp_stats_first_last(comp_stats).filter(
        F.col("level_key").startswith("LEVEL-"))
    return fl.select(
        "url", "cf",
        F.regexp_extract("level_key", r"LEVEL-(\d+)", 1).cast("int")
        .alias("level"),
        F.col("first.size_bytes").alias("start_size_bytes"),
        F.col("first.num_files").alias("start_num_files"),
        F.col("last.size_bytes").alias("end_size_bytes"),
        F.col("last.num_files").alias("end_num_files"))


# -- A16: live files info ------------------------------------------------------

def live_files_stats(events: DataFrame) -> DataFrame:
    """calc_utils.py:497-532: per-cf live counts + sizes of alive files."""
    files = joins.file_lifecycle(events)
    tp = F.col("p.table_properties")
    alive = files.filter(F.col("status") == "Alive")
    return alive.groupBy("url", "cf").agg(
        F.count("*").alias("n_live_files"),
        F.sum(tp["data_size"]).alias("total_data_size"),
        F.sum(tp["index_size"]).alias("total_index_size"),
        F.sum(tp["filter_size"]).alias("total_filter_size"))


def running_live_size(events: DataFrame) -> DataFrame:
    """db_files.py:51-123: running live size per cf (creation +size,
    deletion -size) + historical max — W5 running window."""
    base = events.filter(F.col("event_type").isin(
        "table_file_creation", "table_file_deletion")).select(
        "url", "cf", "seq", F.col("p.file_number").alias("file_number"),
        F.col("p.file_size").alias("file_size"), "event_type")
    # deletion events lack file_size: borrow it from the creation event
    sizes = base.filter(F.col("event_type") == "table_file_creation") \
        .select("url", "file_number",
                F.col("file_size").alias("created_size"))
    signed = base.join(sizes, ["url", "file_number"], "left").withColumn(
        "delta",
        F.when(F.col("event_type") == "table_file_creation",
               F.coalesce("file_size", F.lit(0)))
        .otherwise(-F.coalesce("created_size", F.lit(0))))
    w = (Window.partitionBy("url", "cf").orderBy("seq")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = signed.withColumn("live_size", F.sum("delta").over(w))
    return run.groupBy("url", "cf").agg(
        F.max_by("live_size", "seq").alias("final_live_size"),
        F.max("live_size").alias("max_live_size"))


# -- A17: compression-type info -------------------------------------------------

def compression_stats(events: DataFrame) -> DataFrame:
    """calc_utils.py:535-573."""
    c = events.filter(F.col("event_type") == "table_file_creation")
    tp = F.col("p.table_properties")
    return c.groupBy("url", tp["compression"].alias("compression")).agg(
        F.count("*").alias("n_files"),
        F.sum("p.file_size").alias("total_compressed_size"),
        F.sum(tp["data_size"] + tp["index_size"] + tp["filter_size"])
        .alias("total_estimated_uncompressed"))


# -- A18: bloom filter stats ------------------------------------------------------

def filter_stats(events: DataFrame) -> DataFrame:
    """db_files.py:290-395 + calc_utils.py:1030-1149: per-cf filter
    policy + avg bits-per-key."""
    c = events.filter(F.col("event_type") == "table_file_creation")
    tp = F.col("p.table_properties")
    return c.groupBy("url", "cf").agg(
        F.countDistinct(tp["filter_policy"]).alias("n_distinct_policies"),
        F.first(tp["filter_policy"], ignorenulls=True).alias("filter_policy"),
        F.sum(tp["filter_size"]).alias("total_filter_size"),
        F.sum(tp["num_filter_entries"]).alias("total_filter_entries")
    ).withColumn(
        "avg_bpk",
        F.round(F.when(F.col("total_filter_entries") > 0,
                       8.0 * F.col("total_filter_size")
                       / F.col("total_filter_entries")).otherwise(0.0), 6))


_BLOOM_COUNTERS = ["rocksdb.bloom.filter.useful",
                   "rocksdb.bloom.filter.full.positive",
                   "rocksdb.bloom.filter.full.true.positive"]


def filter_effectiveness_counters(counters: DataFrame) -> DataFrame:
    """A18 complete (calc_utils.py:1080-1149): bloom counter rollup with
    the 1-in-N false-positive rate.  One row per url that dumped any
    counters; missing bloom counters default to 0 like the reference's
    get_last_counter_value."""
    last = (counters.filter(F.col("name").isin(_BLOOM_COUNTERS))
            .groupBy("url", "name")
            .agg(F.max_by("value", "seq").alias("v")))
    p = (counters.select("url").distinct()
         .join(last.groupBy("url").pivot("name", _BLOOM_COUNTERS)
               .agg(F.first("v")), "url", "left").na.fill(0)
         .withColumnRenamed("rocksdb.bloom.filter.useful", "negatives")
         .withColumnRenamed("rocksdb.bloom.filter.full.positive",
                            "positives")
         .withColumnRenamed("rocksdb.bloom.filter.full.true.positive",
                            "true_positives"))
    fp = (F.col("positives") - F.col("true_positives")).alias(
        "false_positives")
    return p.select(
        "url", "negatives", "positives", "true_positives", fp,
        F.when(F.col("positives") - F.col("true_positives") > 0,
               F.floor((F.col("negatives") + F.col("positives"))
                       / (F.col("positives") - F.col("true_positives")))
               .cast("long")).otherwise(F.lit(0).cast("long"))
        .alias("one_in_n_fpr"))


def growth_total(comp_stats: DataFrame, cf_registry: DataFrame) -> DataFrame:
    """A15 complete (calc_utils.py:101-214): db-wide growth between the
    FIRST and LAST stats dump with the reference's partial-data rules —
    a cf contributes only if every level seen at start is also present
    at the end (levels appearing only at the end contribute (0 -> end)).

    Dump-time semantics: 'first/last dump' are the first/last dump
    timestamps per url, not per-cf extremes."""
    lv = comp_stats.filter(F.col("level_key").startswith("LEVEL-")).select(
        "url", "ts", "cf", "seq",
        F.regexp_extract("level_key", r"LEVEL-(\d+)", 1).cast("int")
        .alias("level"),
        F.element_at("attrs", "size_bytes").cast("long").alias("size"),
        F.element_at("attrs", "Num-Files").cast("long").alias("files"))
    bounds = comp_stats.groupBy("url").agg(
        F.min_by("ts", "seq").alias("first_ts"),
        F.max_by("ts", "seq").alias("last_ts"))
    first = (lv.join(bounds, "url")
             .filter(F.col("ts") == F.col("first_ts"))
             .select("url", "cf", "level", F.col("size").alias("start_size"),
                     F.col("files").alias("start_files")))
    last = (lv.join(bounds, "url")
            .filter(F.col("ts") == F.col("last_ts"))
            .select("url", "cf", "level", F.col("size").alias("end_size"),
                    F.col("files").alias("end_files")))
    g = first.join(last, ["url", "cf", "level"], "full_outer")

    contrib_start = F.coalesce("start_size", F.lit(0))
    contrib_files_start = F.coalesce("start_files", F.lit(0))
    per_cf = g.groupBy("url", "cf").agg(
        F.max(F.when(F.col("end_size").isNull(), 1).otherwise(0))
        .alias("excluded"),
        F.sum(contrib_start).alias("start_size_bytes"),
        F.sum(contrib_files_start).alias("start_num_files"),
        F.sum("end_size").alias("end_size_bytes"),
        F.sum("end_files").alias("end_num_files"))

    # num_cfs = |non-auto registry cfs  U  cfs appearing in the dumps|
    reg = (cf_registry.filter(~F.col("auto_generated"))
           .select("url", "cf").distinct())
    all_cfs = reg.unionByName(per_cf.select("url", "cf")).distinct()
    n_cfs = all_cfs.groupBy("url").agg(F.count("*").alias("num_cfs"))

    included = per_cf.filter(F.col("excluded") == 0)
    totals = included.groupBy("url").agg(
        F.count("*").alias("num_included_cfs"),
        F.sum("start_size_bytes").alias("start_size_bytes"),
        F.sum("start_num_files").alias("start_num_files"),
        F.sum("end_size_bytes").alias("end_size_bytes"),
        F.sum("end_num_files").alias("end_num_files"))
    return (n_cfs.join(totals, "url", "left")
            .na.fill({"num_included_cfs": 0})
            .join(comp_stats.select("url").distinct(), "url", "left_semi"))


_CACHE_OPTS = ["block_cache", "block_cache_name", "block_cache_capacity",
               "block_cache_num_shard_bits"]


def block_cache_files_stats(options: DataFrame,
                            events: DataFrame) -> DataFrame:
    """A22 complete (cache_utils.py:98-232): per (url, cache-id) cache
    options joined with the member cf-s' live file block stats (index /
    filter block sizes from the file-lifecycle replay).  Zero-size
    blocks never count (db_files.py:90-92)."""
    topts = options.filter(F.col("section") == "table").groupBy(
        "url", "cf").pivot("option", _CACHE_OPTS).agg(
        F.min_by("value", "seq"))
    ptr = F.regexp_extract("block_cache", r"(0x[\dA-Fa-f]+)", 1)
    member = (topts
              .filter(F.col("block_cache").isNotNull()
                      & (~F.lower("block_cache").isin(
                          "none", "(nil)", "nil", "nullptr", "null", "0x0"))
                      & (ptr != "")
                      & F.col("block_cache_name").isNotNull()
                      & F.col("block_cache_capacity").isNotNull()
                      & F.col("block_cache_num_shard_bits").isNotNull())
              .select("url", "cf",
                      F.concat("block_cache_name", F.lit("@"), ptr)
                      .alias("cache_id"),
                      F.col("block_cache_capacity").cast("long")
                      .alias("capacity"),
                      F.col("block_cache_num_shard_bits").cast("int")
                      .alias("shard_bits")))

    files = joins.file_lifecycle(events).select(
        "url", "cf", "status",
        F.col("p.table_properties.index_size").alias("index_size"),
        F.col("p.table_properties.filter_size").alias("filter_size"))
    per_cf = files.join(member.select("url", "cf", "cache_id"),
                        ["url", "cf"], "inner")

    def block(col):
        nz = F.when(F.col(col) > 0, F.col(col))
        alive = F.when((F.col("status") == "Alive") & (F.col(col) > 0),
                       F.col(col))
        return [
            F.sum(alive).alias(f"{col[:-5]}_total_live"),
            F.count(nz).alias(f"{col[:-5]}_num_created"),
            F.round(F.when(F.count(nz) > 0, F.sum(nz) / F.count(nz))
                    .otherwise(0.0), 6).alias(f"{col[:-5]}_avg"),
            F.max(nz).alias(f"{col[:-5]}_max"),
        ]

    stats = per_cf.groupBy("url", "cache_id").agg(
        F.count("*").alias("n_files"),
        *block("index_size"), *block("filter_size"))

    caches = member.groupBy("url", "cache_id").agg(
        F.min("capacity").alias("capacity"),
        F.min("shard_bits").alias("shard_bits"),
        F.count("*").alias("n_member_cfs"))
    num_shards = F.pow(F.lit(2.0), F.col("shard_bits")).cast("long")
    out = (caches.join(stats, ["url", "cache_id"], "left")
           .withColumn("num_shards", num_shards)
           .withColumn("shard_size",
                       F.floor((F.col("capacity") + num_shards - 1)
                               / num_shards).cast("long")))
    return out.select(
        "url", "cache_id", "capacity", "num_shards", "shard_size",
        "n_member_cfs", "n_files",
        "index_total_live", "index_avg", "index_max",
        "filter_total_live", "filter_avg", "filter_max")


# -- A19/A20: read latency per cf + read density ------------------------------------

def read_latency_per_cf(read_latency: DataFrame) -> DataFrame:
    """calc_utils.py:820-863: weighted avg over levels of the LAST dump
    per (url, cf, level)."""
    last = read_latency.groupBy("url", "cf", "level").agg(
        F.max_by(F.struct("count", "average", "max"), "seq").alias("v"))
    per_cf = last.groupBy("url", "cf").agg(
        F.sum("v.count").alias("num_reads"),
        F.round(F.when(F.sum("v.count") > 0,
                       F.sum(F.col("v.count") * F.col("v.average"))
                       / F.sum("v.count")).otherwise(0.0), 6)
        .alias("avg_read_latency_us"),
        F.max("v.max").alias("max_read_latency_us"))
    w = Window.partitionBy("url")
    return per_cf.withColumn(
        "percent_of_all_reads",
        F.round(F.when(F.sum("num_reads").over(w) > 0,
                       100.0 * F.col("num_reads")
                       / F.sum("num_reads").over(w)).otherwise(0.0), 6))


# -- A21: warnings counts (+ rollup) ---------------------------------------------------

def warnings_counts(warnings_sink_df: DataFrame) -> DataFrame:
    """warnings_mngr.py:108-146 + calc_utils.py:1010-1027: counts per
    (url, warn_type, cf, category) with rollup totals."""
    return warnings_sink_df.rollup("url", "warn_type", "cf", "category") \
        .agg(F.count("*").alias("n")).filter(F.col("url").isNotNull())


# -- A23: stall totals -------------------------------------------------------------------

def stall_totals(db_stats_stalls: DataFrame) -> DataFrame:
    """stats_mngr.py:85-99 aggregated per url."""
    return db_stats_stalls.groupBy("url").agg(
        F.max("cumulative_duration_ms").alias("max_cumulative_stall_ms"),
        F.sum("interval_duration_ms").alias("total_interval_stall_ms"),
        F.count("*").alias("n_stall_samples"))


# -- A20: read density per level ---------------------------------------------

def read_density_per_level(comp_stats: DataFrame,
                           read_latency: DataFrame) -> DataFrame:
    """calc_utils.py:866-932: per (url, cf, level):
    read_norm = level reads / cf reads (last read-latency dump),
    size_norm = level size / cf size (last compaction-stats dump),
    density = read_norm / size_norm, re-normalized so densities sum to 1.
    """
    # last read-latency dump per (url, cf, level)
    last_reads = read_latency.groupBy("url", "cf", "level").agg(
        F.max_by("count", "seq").alias("level_reads"))
    w_cf = Window.partitionBy("url", "cf")
    reads = last_reads.withColumn(
        "cf_reads", F.sum("level_reads").over(w_cf))

    # last compaction-stats dump per (url, cf, level)
    fl = comp_stats_first_last(comp_stats)
    level_sizes = fl.filter(F.col("level_key").startswith("LEVEL-")).select(
        "url", "cf",
        F.regexp_extract("level_key", r"LEVEL-(\d+)", 1).cast("long")
        .alias("level"),
        F.col("last.size_bytes").alias("level_size"))
    cf_sizes = fl.filter(F.col("level_key") == "SUM").select(
        "url", "cf", F.col("last.size_bytes").alias("cf_size"))

    j = (reads.join(level_sizes, ["url", "cf", "level"], "inner")
         .join(cf_sizes, ["url", "cf"], "inner")
         .filter((F.col("cf_reads") > 0) & (F.col("cf_size") > 0)
                 & (F.col("level_size") > 0)))
    density = j.withColumn(
        "density",
        (F.col("level_reads") / F.col("cf_reads"))
        / (F.col("level_size") / F.col("cf_size")))
    total = Window.partitionBy("url", "cf")
    return density.withColumn(
        "weighted_density",
        F.round(F.col("density") / F.sum("density").over(total), 6)).select(
        "url", "cf", "level", "level_reads", "level_size",
        F.round("density", 6).alias("density"), "weighted_density")


# -- A22: block-cache stats assembly ------------------------------------------

def block_cache_assembly(block_cache: DataFrame,
                         counters: DataFrame) -> DataFrame:
    """cache_utils.py:98-232: per (url, cache_id): capacity, last usage,
    per-role last sizes, plus the last values of the block-cache
    counters."""
    cap = (block_cache.filter(F.col("row") == "capacity")
           .groupBy("url", "cache_id")
           .agg(F.max_by("capacity", "seq").alias("capacity")))
    usage = (block_cache.filter(F.col("row") == "usage")
             .groupBy("url", "cache_id")
             .agg(F.max_by("usage", "seq").alias("last_usage")))
    roles = (block_cache.filter(F.col("row") == "role")
             .groupBy("url", "cache_id", "role")
             .agg(F.max_by("size", "seq").alias("size"),
                  F.max_by("count", "seq").alias("count")))
    roles_map = roles.groupBy("url", "cache_id").agg(
        F.map_from_entries(F.sort_array(F.collect_list(F.struct(
            "role", F.struct("size", "count"))))).alias("roles"))

    cache_counters = counters.filter(
        F.col("name").startswith("rocksdb.block.cache."))
    last_counters = (cache_counters.groupBy("url", "name")
                     .agg(F.max_by("value", "seq").alias("v"))
                     .groupBy("url")
                     .agg(F.map_from_entries(F.sort_array(F.collect_list(
                         F.struct("name", "v")))).alias("cache_counters")))

    return (cap.join(usage, ["url", "cache_id"], "left")
            .join(roles_map, ["url", "cache_id"], "left")
            .join(last_counters, ["url"], "left"))
