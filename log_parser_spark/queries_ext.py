"""Driver queries (rounds 3-4) beyond the base registry.

Round 3: operators that previously had only pytest parity evidence —
the S3/S4 sink grids, the report-embedded aggregates
A2/A5/A7/A8/A12/A16/A20, the S8 files sink, the P21 memory-report
rollup — plus LSH drop accounting and crawl-URL canonicalization.

Round 4: the drop/recall accounting siblings (cosine buckets, ANN
recall@k), sorted-query URL canonicalization, and the standard
web-corpus curation set: Gopher quality + repetition rules, C4
cleaning rules, PII scrubbing, deterministic stratified sampling.

Each entry follows the established pattern: a Spark builder + a DuckDB
oracle SQL over the same inputs, with every aggregate aliased
identically on both sides.  Reference parity anchors (file:line) are
on each builder's docstring where a reference behavior is mirrored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F

from log_parser_spark.datafiles import data_path

_R = f"read_parquet('{data_path('log_records.parquet')}')"


def _records(spark):
    from log_parser_spark.queries import _records as _r
    return _r(spark)


# --------------------------------------------------------- A2: histograms

def log_histograms_last(spark, sf_dir):
    """A2: last histogram entry per (url, name) (counters.py:254-264)."""
    from log_parser_spark.engine import aggregates, branches
    h = aggregates.last_histogram_entry(branches.histograms(_records(spark)))
    return h.select(
        "url", "name",
        F.col("last.p50").alias("p50"), F.col("last.p95").alias("p95"),
        F.col("last.p99").alias("p99"), F.col("last.p100").alias("p100"),
        F.col("last.count").alias("n_samples"),
        F.col("last.sum").alias("total_sum"),
        F.col("last.average").alias("average"))


LOG_HISTOGRAMS_LAST_SQL = f"""
SELECT url, name,
  arg_max(CAST(json_extract_string(attrs_json, '$.P50') AS DOUBLE), seq)
    AS p50,
  arg_max(CAST(json_extract_string(attrs_json, '$.P95') AS DOUBLE), seq)
    AS p95,
  arg_max(CAST(json_extract_string(attrs_json, '$.P99') AS DOUBLE), seq)
    AS p99,
  arg_max(CAST(json_extract_string(attrs_json, '$.P100') AS DOUBLE), seq)
    AS p100,
  arg_max(CAST(json_extract_string(attrs_json, '$.Count') AS BIGINT), seq)
    AS n_samples,
  arg_max(CAST(json_extract_string(attrs_json, '$.Sum') AS BIGINT), seq)
    AS total_sum,
  arg_max(CAST(json_extract_string(attrs_json, '$.Average') AS DOUBLE), seq)
    AS average
FROM {_R} WHERE kind = 'histogram' GROUP BY url, name
"""


# ----------------------------------------------------- S3/S4: sink grids

def log_counters_grid(spark, sf_dir):
    """S3: the zero-filled time x non-all-zero-counter grid that backs
    the counters CSV (csv_outputter.py:25-72)."""
    from log_parser_spark.engine import branches, sinks
    return sinks.counters_sink(branches.counters(_records(spark)))


LOG_COUNTERS_GRID_SQL = f"""
WITH c AS (SELECT url, ts, name, value, seq FROM {_R}
           WHERE kind = 'counter'),
nz AS (SELECT url, name, min(seq) AS first_seen FROM c
       GROUP BY url, name HAVING max(value) > 0),
times AS (SELECT DISTINCT url, ts FROM c),
vals AS (SELECT url, ts, name, arg_min(value, seq) AS value FROM c
         GROUP BY url, ts, name)
SELECT t.url, t.ts, nz.name, coalesce(v.value, 0) AS value, nz.first_seen
FROM times t JOIN nz ON t.url = nz.url
LEFT JOIN vals v ON v.url = t.url AND v.ts = t.ts AND v.name = nz.name
"""

_HIST_GRID_COLS = [
    ("p50", "P50", "DOUBLE"), ("p95", "P95", "DOUBLE"),
    ("p99", "P99", "DOUBLE"), ("p100", "P100", "DOUBLE"),
    ("count", "Count", "BIGINT"), ("sum", "Sum", "BIGINT"),
    ("average", "Average", "DOUBLE"),
    ("interval_count", "Interval Count", "BIGINT"),
    ("interval_sum", "Interval Sum", "BIGINT"),
]


def log_histograms_grid(spark, sf_dir):
    """S4: the zero-filled time x histogram grid behind the human/tools
    histogram CSVs (csv_outputter.py:75-195)."""
    from log_parser_spark.engine import branches, sinks
    return sinks.histograms_sink(branches.histograms(_records(spark)))


_HG_EXTRACT = ",\n".join(
    f"""         arg_min(CAST(json_extract_string(attrs_json,
              '$."{j}"') AS {t}), seq) AS "{c}\"""" for c, j, t
    in _HIST_GRID_COLS)
_HG_ZERO = ",\n".join(
    f'       coalesce(v."{c}", 0) AS "{c}"' for c, _j, _t in _HIST_GRID_COLS)

LOG_HISTOGRAMS_GRID_SQL = f"""
WITH h AS (SELECT url, ts, name, attrs_json, seq FROM {_R}
           WHERE kind = 'histogram'),
nz AS (SELECT url, name, min(seq) AS first_seen FROM h
       GROUP BY url, name
       HAVING max(CAST(json_extract_string(attrs_json, '$.Count')
                       AS BIGINT)) > 0),
times AS (SELECT DISTINCT url, ts FROM h),
vals AS (SELECT url, ts, name,
{_HG_EXTRACT},
         true AS present
         FROM h GROUP BY url, ts, name)
SELECT t.url, t.ts, nz.name,
{_HG_ZERO},
       coalesce(v.present, false) AS present, nz.first_seen
FROM times t JOIN nz ON t.url = nz.url
LEFT JOIN vals v ON v.url = t.url AND v.ts = t.ts AND v.name = nz.name
"""


# -------------------------------------------------------- A5/A8: opers

def log_user_opers(spark, sf_dir):
    """A5: write/read/seek totals + percentages (calc_utils.py:315-348)."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.user_opers_stats(branches.counters(_records(spark)))


LOG_USER_OPERS_SQL = f"""
WITH last AS (
  SELECT url, name, arg_max(value, seq) AS v FROM {_R}
  WHERE kind = 'counter'
    AND name IN ('rocksdb.number.keys.written', 'rocksdb.number.keys.read',
                 'rocksdb.number.db.seek')
  GROUP BY url, name),
p AS (
  SELECT url,
    CAST(coalesce(max(CASE WHEN name = 'rocksdb.number.keys.written'
                       THEN v END), 0) AS BIGINT) AS num_written,
    CAST(coalesce(max(CASE WHEN name = 'rocksdb.number.keys.read'
                       THEN v END), 0) AS BIGINT) AS num_read,
    CAST(coalesce(max(CASE WHEN name = 'rocksdb.number.db.seek'
                       THEN v END), 0) AS BIGINT) AS num_seek
  FROM last GROUP BY url)
SELECT url, num_written, num_read, num_seek,
       CAST(num_written + num_read + num_seek AS BIGINT) AS num_total,
       CAST(round(CASE WHEN num_written + num_read + num_seek > 0
            THEN 100.0 * num_written / (num_written + num_read + num_seek)
            ELSE 0.0 END, 6) AS DOUBLE) AS percent_written,
       CAST(round(CASE WHEN num_written + num_read + num_seek > 0
            THEN 100.0 * num_read / (num_written + num_read + num_seek)
            ELSE 0.0 END, 6) AS DOUBLE) AS percent_read,
       CAST(round(CASE WHEN num_written + num_read + num_seek > 0
            THEN 100.0 * num_seek / (num_written + num_read + num_seek)
            ELSE 0.0 END, 6) AS DOUBLE) AS percent_seek
FROM p
"""


def log_delete_opers(spark, sf_dir):
    """A8: flushed entries vs deletes per url (calc_utils.py:252-312)."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.delete_opers_stats(branches.events(_records(spark)))


LOG_DELETE_OPERS_SQL = f"""
WITH fs AS (
  SELECT url,
    CAST(json_extract_string(payload_json, '$.num_entries') AS BIGINT)
      AS num_entries,
    CAST(json_extract_string(payload_json, '$.num_deletes') AS BIGINT)
      AS num_deletes
  FROM {_R} WHERE kind = 'event' AND event_type = 'flush_started')
SELECT url,
  CAST(sum(num_entries) AS BIGINT) AS total_num_flushed_entries,
  CAST(sum(num_deletes) AS BIGINT) AS total_num_deletes,
  CAST(round(CASE WHEN sum(num_entries) > 0
       THEN 100.0 * sum(num_deletes) / sum(num_entries)
       ELSE 0.0 END, 6) AS DOUBLE) AS percent_deletes
FROM fs GROUP BY url
"""


# ------------------------------------------------- A7: table creation

def log_table_creation_stats(spark, sf_dir):
    """A7: per-cf creation totals (calc_utils.py:217-249)."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.table_creation_stats(branches.events(_records(spark)))


LOG_TABLE_CREATION_SQL = f"""
WITH c AS (
  SELECT url, cf,
    CAST(json_extract_string(payload_json,
         '$.table_properties.num_entries') AS BIGINT) AS num_entries,
    CAST(json_extract_string(payload_json,
         '$.table_properties.raw_key_size') AS BIGINT) AS raw_key_size,
    CAST(json_extract_string(payload_json,
         '$.table_properties.raw_value_size') AS BIGINT) AS raw_value_size
  FROM {_R} WHERE kind = 'event' AND event_type = 'table_file_creation')
SELECT url, cf, count(*) AS num_created,
  CAST(sum(num_entries) AS BIGINT) AS total_num_entries,
  CAST(sum(raw_key_size) AS BIGINT) AS total_keys_sizes,
  CAST(sum(raw_value_size) AS BIGINT) AS total_values_sizes,
  CAST(round(avg(num_entries), 6) AS DOUBLE) AS avg_num_entries
FROM c GROUP BY url, cf
"""


# ------------------------------------------------ A12: largest compaction

def log_largest_compaction(spark, sf_dir):
    """A12: max compaction input size per url (calc_utils.py:677-685)."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.largest_compaction_input(
        branches.events(_records(spark)))


LOG_LARGEST_COMPACTION_SQL = f"""
SELECT url,
  max(CAST(json_extract_string(payload_json, '$.input_data_size')
           AS BIGINT)) AS largest_compaction_size_bytes
FROM {_R} WHERE kind = 'event' AND event_type = 'compaction_started'
GROUP BY url
"""


# ------------------------------------------- A16 + S8: file lifecycle

_FILES_CTE = f"""
fe AS (
  SELECT url, seq, ts, cf, event_type,
    CAST(json_extract_string(payload_json, '$.file_number') AS BIGINT)
      AS file_number,
    CAST(json_extract_string(payload_json, '$.file_size') AS BIGINT)
      AS file_size,
    CAST(json_extract_string(payload_json,
         '$.table_properties.data_size') AS BIGINT) AS data_size,
    CAST(json_extract_string(payload_json,
         '$.table_properties.index_size') AS BIGINT) AS index_size,
    CAST(json_extract_string(payload_json,
         '$.table_properties.filter_size') AS BIGINT) AS filter_size,
    CAST(json_extract_string(payload_json,
         '$.table_properties.num_entries') AS BIGINT) AS num_entries,
    json_extract_string(payload_json,
         '$.table_properties.compression') AS compression
  FROM {_R} WHERE kind = 'event'
    AND event_type IN ('table_file_creation', 'table_file_deletion')),
files AS (
  SELECT url, file_number,
    arg_min(CASE WHEN event_type = 'table_file_creation' THEN ts END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS created_ts,
    arg_min(CASE WHEN event_type = 'table_file_creation' THEN cf END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS cf,
    arg_min(CASE WHEN event_type = 'table_file_creation'
            THEN file_size END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS file_size,
    arg_min(CASE WHEN event_type = 'table_file_creation'
            THEN data_size END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS data_size,
    arg_min(CASE WHEN event_type = 'table_file_creation'
            THEN index_size END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS index_size,
    arg_min(CASE WHEN event_type = 'table_file_creation'
            THEN filter_size END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS filter_size,
    arg_min(CASE WHEN event_type = 'table_file_creation'
            THEN num_entries END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS num_entries,
    arg_min(CASE WHEN event_type = 'table_file_creation'
            THEN compression END,
            CASE WHEN event_type = 'table_file_creation' THEN seq END)
      AS compression,
    min(CASE WHEN event_type = 'table_file_deletion' THEN ts END)
      AS deleted_ts,
    bool_or(event_type = 'table_file_creation') AS created
  FROM fe GROUP BY url, file_number),
lifecycle AS (
  SELECT *, CASE WHEN deleted_ts IS NOT NULL THEN 'Deleted'
                 ELSE 'Alive' END AS status
  FROM files WHERE created)
"""


def log_files(spark, sf_dir):
    """S8: the files sink (creation props + deletion status,
    csv_outputter.py:431-493) — driver-visible projection."""
    from log_parser_spark.engine import branches, sinks
    return sinks.files_sink(branches.events(_records(spark))).select(
        "url", "file_number", "status", "created_ts", "deleted_ts", "cf",
        "file_size", "data_size", "index_size", "filter_size",
        "num_entries", "compression")


LOG_FILES_SQL = f"""
WITH {_FILES_CTE}
SELECT url, file_number, status, created_ts, deleted_ts, cf, file_size,
       data_size, index_size, filter_size, num_entries, compression
FROM lifecycle
"""


def log_live_files(spark, sf_dir):
    """A16: per-cf live file counts + sizes (calc_utils.py:497-532)."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.live_files_stats(branches.events(_records(spark)))


LOG_LIVE_FILES_SQL = f"""
WITH {_FILES_CTE}
SELECT url, cf, count(*) AS n_live_files,
  CAST(sum(data_size) AS BIGINT) AS total_data_size,
  CAST(sum(index_size) AS BIGINT) AS total_index_size,
  CAST(sum(filter_size) AS BIGINT) AS total_filter_size
FROM lifecycle WHERE status = 'Alive' GROUP BY url, cf
"""


def log_running_live_size(spark, sf_dir):
    """A16/W5: running live size per cf with historical max
    (db_files.py:51-123)."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.running_live_size(branches.events(_records(spark)))


LOG_RUNNING_LIVE_SQL = f"""
WITH fe AS (
  SELECT url, seq, cf, event_type,
    CAST(json_extract_string(payload_json, '$.file_number') AS BIGINT)
      AS file_number,
    CAST(json_extract_string(payload_json, '$.file_size') AS BIGINT)
      AS file_size
  FROM {_R} WHERE kind = 'event'
    AND event_type IN ('table_file_creation', 'table_file_deletion')),
sizes AS (SELECT url, file_number, file_size AS created_size FROM fe
          WHERE event_type = 'table_file_creation'),
signed AS (
  SELECT fe.url, fe.cf, fe.seq,
         CASE WHEN fe.event_type = 'table_file_creation'
              THEN coalesce(fe.file_size, 0)
              ELSE -coalesce(s.created_size, 0) END AS delta
  FROM fe LEFT JOIN sizes s
    ON fe.url = s.url AND fe.file_number = s.file_number),
run AS (
  SELECT url, cf, seq,
         CAST(sum(delta) OVER
              (PARTITION BY url, cf ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS live_size
  FROM signed)
SELECT url, cf, arg_max(live_size, seq) AS final_live_size,
       max(live_size) AS max_live_size
FROM run GROUP BY url, cf
"""


# ---------------------------------------------- A20: read density

def log_read_density(spark, sf_dir):
    """A20: per-level read density vs size share
    (calc_utils.py:866-932)."""
    from log_parser_spark.engine import aggregates, branches
    r = _records(spark)
    return aggregates.read_density_per_level(
        branches.comp_stats(r), branches.read_latency(r))


LOG_READ_DENSITY_SQL = f"""
WITH rl AS (
  SELECT url, cf, value AS level, seq,
    CAST(json_extract_string(attrs_json, '$.count') AS BIGINT) AS cnt
  FROM {_R} WHERE kind = 'read_latency'),
last_reads AS (
  SELECT url, cf, level, arg_max(cnt, seq) AS level_reads
  FROM rl GROUP BY url, cf, level),
reads AS (
  SELECT *, sum(level_reads) OVER (PARTITION BY url, cf) AS cf_reads
  FROM last_reads),
cs AS (SELECT url, cf, name, seq,
         CAST(json_extract_string(attrs_json, '$.size_bytes') AS BIGINT)
           AS size_bytes
       FROM {_R} WHERE kind = 'comp_stats'),
level_sizes AS (
  SELECT url, cf,
         CAST(regexp_extract(name, 'LEVEL-(\\d+)', 1) AS BIGINT) AS level,
         arg_max(size_bytes, seq) AS level_size
  FROM cs WHERE name LIKE 'LEVEL-%' GROUP BY url, cf, level),
cf_sizes AS (
  SELECT url, cf, arg_max(size_bytes, seq) AS cf_size
  FROM cs WHERE name = 'SUM' GROUP BY url, cf),
j AS (
  SELECT r.url, r.cf, r.level, r.level_reads, ls.level_size,
         (r.level_reads * 1.0 / r.cf_reads)
         / (ls.level_size * 1.0 / c.cf_size) AS density
  FROM reads r
  JOIN level_sizes ls ON r.url = ls.url AND r.cf = ls.cf
    AND r.level = ls.level
  JOIN cf_sizes c ON r.url = c.url AND r.cf = c.cf
  WHERE r.cf_reads > 0 AND c.cf_size > 0 AND ls.level_size > 0)
SELECT url, cf, level, level_reads, level_size,
       CAST(round(density, 6) AS DOUBLE) AS density,
       CAST(round(density / sum(density) OVER (PARTITION BY url, cf), 6)
            AS DOUBLE) AS weighted_density
FROM j
"""


# ------------------------------------------------ P21: memory reports

def log_mem_reports(spark, sf_dir):
    """P21: Memory Reporting rollup — last usage + sample count per
    (url, section, cf, entity) (mem_rep_parser.py:25-157)."""
    r = _records(spark).filter(F.col("kind") == "memrep")
    return (r.select("url", F.col("name").alias("section"), "cf",
                     F.element_at("attrs", "entity").alias("entity"),
                     "msg", "seq")
            .groupBy("url", "section", "cf", "entity")
            .agg(F.count(F.lit(1)).alias("n_samples"),
                 F.max_by("msg", "seq").alias("last_usage")))


LOG_MEM_REPORTS_SQL = f"""
SELECT url, name AS section, cf,
       json_extract_string(attrs_json, '$.entity') AS entity,
       count(*) AS n_samples,
       arg_max(msg, seq) AS last_usage
FROM {_R} WHERE kind = 'memrep'
GROUP BY url, section, cf, entity
"""


# ------------------------------- P16/P17/P22/J1 + observability channels

def log_cumulative_writes(spark, sf_dir):
    """P16 (writes half): last cumulative-writes sample + peak ingest
    rate per url (stats_mngr.py:129-160)."""
    from log_parser_spark.engine import branches
    w = branches.cumulative_writes(_records(spark))
    return w.groupBy("url").agg(
        F.max_by("num_writes", "seq").alias("last_num_writes"),
        F.max_by("num_keys", "seq").alias("last_num_keys"),
        F.max_by("ingest", "seq").alias("last_ingest_bytes"),
        F.round(F.max("ingest_rate_mbps"), 6).alias("max_ingest_rate_mbps"),
        F.count(F.lit(1)).alias("n_samples"))


LOG_CUMULATIVE_WRITES_SQL = f"""
SELECT url,
  arg_max(CAST(json_extract_string(attrs_json, '$.num_writes') AS BIGINT),
          seq) AS last_num_writes,
  arg_max(CAST(json_extract_string(attrs_json, '$.num_keys') AS BIGINT),
          seq) AS last_num_keys,
  arg_max(CAST(json_extract_string(attrs_json, '$.ingest') AS BIGINT),
          seq) AS last_ingest_bytes,
  CAST(round(max(CAST(json_extract_string(attrs_json,
       '$.ingest_rate_mbps') AS DOUBLE)), 6) AS DOUBLE)
    AS max_ingest_rate_mbps,
  count(*) AS n_samples
FROM {_R} WHERE kind = 'cumulative_writes' GROUP BY url
"""


def log_cf_stalls(spark, sf_dir):
    """P17: per-cf stall counts — last sample per reason + total
    (stats_mngr.py:608-652 CfNoFileStatsMngr)."""
    from log_parser_spark.engine import branches
    s = branches.cf_stalls(_records(spark))
    return s.groupBy("url", "cf", "reason").agg(
        F.max_by("count", "seq").alias("last_count"),
        F.sum("count").alias("total_count"),
        F.count(F.lit(1)).alias("n_samples"))


LOG_CF_STALLS_SQL = f"""
SELECT url, cf, name AS reason,
       arg_max(value, seq) AS last_count,
       CAST(sum(value) AS BIGINT) AS total_count,
       count(*) AS n_samples
FROM {_R} WHERE kind = 'cf_stalls' GROUP BY url, cf, reason
"""


def log_cf_lifetime(spark, sf_dir):
    """P22: cf create/recover/drop lifecycle events per (url, cf)
    (cfs_infos.py lifecycle tracking)."""
    r = _records(spark).filter(F.col("kind") == "cf_lifetime")
    return (r.select("url", "cf", F.col("name").alias("action"),
                     F.element_at("attrs", "cf_id").cast("long")
                     .alias("cf_id"), "seq")
            .groupBy("url", "cf", "action")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("cf_id").alias("min_cf_id")))


LOG_CF_LIFETIME_SQL = f"""
SELECT url, cf, name AS action, count(*) AS n,
       min(CAST(json_extract_string(attrs_json, '$.cf_id') AS BIGINT))
         AS min_cf_id
FROM {_R} WHERE kind = 'cf_lifetime' GROUP BY url, cf, action
"""


def log_job_cf(spark, sf_dir):
    """J1: the job->cf map rolled up — jobs per (url, cf)
    (log_file.py:256-269)."""
    from log_parser_spark.engine import joins
    m = joins.job_cf_map(_records(spark))
    return m.groupBy("url", "job_cf").agg(
        F.count(F.lit(1)).alias("n_jobs"),
        F.min("job_id").alias("min_job_id"),
        F.max("job_id").alias("max_job_id"))


LOG_JOB_CF_SQL = f"""
WITH m AS (
  SELECT url, job_id, arg_min(cf, seq) AS job_cf
  FROM {_R} WHERE kind = 'job_cf' GROUP BY url, job_id)
SELECT url, job_cf, count(*) AS n_jobs,
       min(job_id) AS min_job_id, max(job_id) AS max_job_id
FROM m GROUP BY url, job_cf
"""


def log_quarantine_stats(spark, sf_dir):
    """Quarantine/unparsed observability: rejected-line accounting per
    (url, channel, reason) — the 'nothing is silently dropped'
    invariant made queryable."""
    r = _records(spark).filter(F.col("kind").isin("quarantine", "unparsed"))
    return (r.select("url", F.col("kind").alias("channel"),
                     F.coalesce(F.element_at("attrs", "reason"),
                                F.lit("unparsed_line")).alias("reason"))
            .groupBy("url", "channel", "reason")
            .agg(F.count(F.lit(1)).alias("n")))


LOG_QUARANTINE_SQL = f"""
SELECT url, kind AS channel,
       coalesce(json_extract_string(attrs_json, '$.reason'),
                'unparsed_line') AS reason,
       count(*) AS n
FROM {_R} WHERE kind IN ('quarantine', 'unparsed')
GROUP BY url, channel, reason
"""


# ------------------------------------------------ crawl URL canonicalization

def url_canonical_dedup(spark, sf_dir):
    """Crawl URL dedup (ops/web.py): plant 3 deterministic variants of
    every corpus url (fragment, empty query, explicit :443) and group
    by the canonical form — each canonical must collapse its 4 spellings
    with the raw original as representative.  The empty-query variant is
    only planted for URLs WITHOUT an existing query ("x?a=1" + "?" would
    be "x?a=1?" — a different canonical); URLs that already carry a
    query contribute the raw spelling again instead, so every canonical
    still groups exactly 4 variant rows."""
    from log_parser_spark.ops import web
    urls = _records(spark).select("url").distinct()
    v = urls.select(F.explode(F.array(
        F.col("url"),
        F.concat("url", F.lit("#fragment")),
        F.when(F.col("url").contains("?"), F.col("url"))
        .otherwise(F.concat("url", F.lit("?"))),
        F.regexp_replace("url", r"^https://([^/]+)", "https://$1:443"),
    )).alias("url"))
    return web.url_dedup(v)


_URL_RE_SQL = (r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(?::(\d+))?"
               r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$")


def _sql_url_part(i):
    return f"regexp_extract(url, '{_URL_RE_SQL}', {i})"


_SQL_CANONICAL = f"""CASE WHEN {_sql_url_part(2)} = '' THEN url ELSE
  lower({_sql_url_part(1)}) || '://' || lower({_sql_url_part(2)})
  || CASE WHEN {_sql_url_part(3)} = ''
            OR (lower({_sql_url_part(1)}) = 'http'
                AND {_sql_url_part(3)} = '80')
            OR (lower({_sql_url_part(1)}) = 'https'
                AND {_sql_url_part(3)} = '443')
          THEN '' ELSE ':' || {_sql_url_part(3)} END
  || CASE WHEN {_sql_url_part(4)} = '' THEN '/'
          ELSE {_sql_url_part(4)} END
  || CASE WHEN {_sql_url_part(5)} = '' THEN ''
          ELSE '?' || {_sql_url_part(5)} END
END"""

URL_CANONICAL_SQL = f"""
WITH u AS (SELECT DISTINCT url FROM {_R}),
v AS (
  SELECT url FROM u
  UNION ALL SELECT url || '#fragment' FROM u
  UNION ALL SELECT CASE WHEN url LIKE '%?%' THEN url
                        ELSE url || '?' END FROM u
  UNION ALL SELECT regexp_replace(url, '^https://([^/]+)',
                                  'https://\\1:443') FROM u),
c AS (SELECT {_SQL_CANONICAL} AS canonical_url, url FROM v)
SELECT canonical_url, min(url) AS representative,
       count(*) AS n_variants
FROM c GROUP BY canonical_url
"""


# --------------------------------------- LSH drop accounting (no silent caps)

def lsh_drop_accounting(spark, sf_dir):
    """The bucket-cap recall contract made driver-visible: plant a
    deterministic boilerplate flood (600 near-identical docs) next to
    real documents, run MinHash LSH with a small cap, and return the
    per-band dropped-bucket/dropped-row accounting that
    with_drop_stats=True exposes.  At 100 TB this is the side output a
    dedup run must publish so capped recall is observable, never
    silent."""
    from log_parser_spark.ops import dedup
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 50).select("doc_id", "text"))
    flood = spark.range(600).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("the same boilerplate page content repeated "
                       "everywhere across the crawl "),
                 F.col("id").cast("string")).alias("text"))
    corpus = docs.unionByName(flood)
    _pairs, drops = dedup.minhash_lsh_pairs(
        corpus, max_bucket_size=64, with_drop_stats=True)
    return (drops.groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_dropped_buckets"),
                 F.sum("bucket_size").alias("n_dropped_rows")))


def url_canonical_sorted(spark, sf_dir):
    """sort_query=True canonicalization (ops/web.py): plant two
    param-permuted spellings of every query-free corpus url — the
    sorted canonical must collapse them into one group of 2, with the
    raw url forming its own group of 1.  (URLs that already carry a
    query keep their raw spelling for all three rows.)"""
    from log_parser_spark.ops import web
    urls = _records(spark).select("url").distinct()
    has_q = F.col("url").contains("?")
    v = urls.select(F.explode(F.array(
        F.col("url"),
        F.when(has_q, F.col("url"))
        .otherwise(F.concat("url", F.lit("?b=2&a=1"))),
        F.when(has_q, F.col("url"))
        .otherwise(F.concat("url", F.lit("?a=1&b=2"))),
    )).alias("url"))
    return web.url_dedup(v, sort_query=True)


_SQL_QUERY_SORTED = (f"array_to_string(list_sort(string_split("
                     f"{_sql_url_part(5)}, '&')), '&')")

_SQL_CANONICAL_SORTED = f"""CASE WHEN {_sql_url_part(2)} = '' THEN url ELSE
  lower({_sql_url_part(1)}) || '://' || lower({_sql_url_part(2)})
  || CASE WHEN {_sql_url_part(3)} = ''
            OR (lower({_sql_url_part(1)}) = 'http'
                AND {_sql_url_part(3)} = '80')
            OR (lower({_sql_url_part(1)}) = 'https'
                AND {_sql_url_part(3)} = '443')
          THEN '' ELSE ':' || {_sql_url_part(3)} END
  || CASE WHEN {_sql_url_part(4)} = '' THEN '/'
          ELSE {_sql_url_part(4)} END
  || CASE WHEN {_sql_url_part(5)} = '' THEN ''
          ELSE '?' || {_SQL_QUERY_SORTED} END
END"""

URL_CANONICAL_SORTED_SQL = f"""
WITH u AS (SELECT DISTINCT url FROM {_R}),
v AS (
  SELECT url FROM u
  UNION ALL SELECT CASE WHEN url LIKE '%?%' THEN url
                        ELSE url || '?b=2&a=1' END FROM u
  UNION ALL SELECT CASE WHEN url LIKE '%?%' THEN url
                        ELSE url || '?a=1&b=2' END FROM u),
c AS (SELECT {_SQL_CANONICAL_SORTED} AS canonical_url, url FROM v)
SELECT canonical_url, min(url) AS representative,
       count(*) AS n_variants
FROM c GROUP BY canonical_url
"""


# ------------------------------------- cosine-LSH drop accounting (r4)

def cosine_drop_accounting(spark, sf_dir):
    """embedding_cosine_dedup's bucket-cap recall contract made
    driver-visible (the sibling of lsh_drop_accounting): plant a
    degenerate same-direction flood (600 scalar multiples of one
    vector — identical hyperplane sign pattern, the anisotropic
    worst case) next to real embeddings, run with a small cap, and
    return the dropped-bucket accounting that with_drop_stats=True
    exposes.  At 100 TB this is the side output a cosine-dedup run
    must publish so capped recall is observable, never silent."""
    from log_parser_spark.ops import dedup
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 50).select("vec_id", "embedding"))
    flood = spark.range(600).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (j.cast("double") *
                       (F.col("id") + 1).cast("double")).cast("float"))
        .alias("embedding"))
    corpus = emb.unionByName(flood)
    _pairs, drops = dedup.embedding_cosine_dedup(
        corpus, max_bucket_size=64, with_drop_stats=True)
    return (drops.groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_dropped_buckets"),
                 F.sum("bucket_size").alias("n_dropped_rows")))


# ------------------------------------------- Gopher quality rules (r4)

def gopher_quality(spark, sf_dir):
    """Gopher document-filter metrics (Rae et al. 2021 §A1.1) per doc
    (ops/text.gopher_quality_columns): rule metrics + the pass flag,
    pure codegen so a 100 TB filtering pass stays JVM-side."""
    from log_parser_spark.ops import text as T
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir)
    return T.gopher_quality_columns(docs).select(
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "bullet_line_ratio", "ellipsis_line_ratio", "alpha_word_ratio",
        "n_req_stopwords", "gopher_pass")


GOPHER_QUALITY_SQL = r"""
WITH q AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS toks,
    list_filter(string_split(text, chr(10)),
                ln -> regexp_matches(ln, '[^ \t\n\x0B\f\r]')) AS lines
  FROM documents),
m AS (
  SELECT doc_id,
    len(toks)::BIGINT AS n_words,
    greatest(len(toks), 1)::DOUBLE AS nzw,
    greatest(len(lines), 1)::DOUBLE AS nzl,
    coalesce(list_sum(list_transform(toks, w -> length(w))), 0)::DOUBLE
      AS total_chars,
    (length(regexp_replace(text, '[^#]', '', 'g'))
     + len(regexp_extract_all(text, '\.\.\.|…')))::DOUBLE AS n_symbols,
    len(list_filter(lines,
        ln -> regexp_matches(ln, '^[ \t\n\x0B\f\r]*[•\-\*]')))::DOUBLE
      AS bullet_lines,
    len(list_filter(lines,
        ln -> regexp_matches(ln, '(\.\.\.|…)[ \t\n\x0B\f\r]*$')))::DOUBLE
      AS ellipsis_lines,
    len(list_filter(toks,
        w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE AS alpha_words,
    len(list_intersect(list_transform(toks, w -> lower(w)),
        ['the','be','to','of','and','that','have','with']))::BIGINT
      AS n_req_stopwords
  FROM q),
r AS (
  SELECT doc_id, n_words,
    CAST(round(total_chars / nzw, 6) AS DOUBLE) AS mean_word_len,
    CAST(round(n_symbols / nzw, 6) AS DOUBLE) AS symbol_word_ratio,
    CAST(round(bullet_lines / nzl, 6) AS DOUBLE) AS bullet_line_ratio,
    CAST(round(ellipsis_lines / nzl, 6) AS DOUBLE) AS ellipsis_line_ratio,
    CAST(round(alpha_words / nzw, 6) AS DOUBLE) AS alpha_word_ratio,
    n_req_stopwords
  FROM m)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
       n_req_stopwords,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3 AND mean_word_len <= 10
        AND symbol_word_ratio <= 0.1 AND bullet_line_ratio <= 0.9
        AND ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8
        AND n_req_stopwords >= 2) AS gopher_pass
FROM r
"""


def gopher_repetition(spark, sf_dir):
    """Gopher repetition-filter metrics (Rae et al. 2021 §A1.1) per doc
    (ops/text.gopher_repetition_columns): duplicate-line fractions +
    most-frequent-bigram char coverage, single codegen projection (the
    bigram max is a sort + linear fold, never per-distinct-gram)."""
    from log_parser_spark.ops import text as T
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir)
    return T.gopher_repetition_columns(docs).select(
        "doc_id", "n_lines", "dup_line_ratio", "dup_line_char_ratio",
        "top_bigram_char_ratio", "repetition_pass")


GOPHER_REPETITION_SQL = r"""
WITH q AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS toks,
    list_filter(string_split(text, chr(10)),
                ln -> regexp_matches(ln, '[^ \t\n\x0B\f\r]')) AS lines
  FROM documents),
base AS (
  SELECT doc_id, lines,
    len(lines)::BIGINT AS n_lines,
    greatest(len(lines), 1)::DOUBLE AS nzl,
    coalesce(list_sum(list_transform(lines, ln -> length(ln))),
             0)::DOUBLE AS line_chars,
    coalesce(list_sum(list_transform(list_distinct(lines),
                                     ln -> length(ln))),
             0)::DOUBLE AS uniq_line_chars,
    len(toks) AS n_words,
    greatest(coalesce(list_sum(list_transform(toks, w -> length(w))),
                      0), 1)::DOUBLE AS nz_word_chars,
    CASE WHEN len(toks) >= 2 THEN
      list_transform(generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])
    ELSE []::VARCHAR[] END AS bigrams
  FROM q),
counts AS (
  SELECT doc_id, g, count(*) AS cnt
  FROM (SELECT doc_id, unnest(bigrams) AS g FROM base)
  GROUP BY doc_id, g),
-- most FREQUENT bigram (ties -> larger coverage), then its
-- count * (len-1) char coverage — mirrors the Spark sorted-scan fold
top AS (
  SELECT c.doc_id, max(c.cnt * (length(c.g) - 1)) AS top_chars
  FROM counts c
  JOIN (SELECT doc_id, max(cnt) AS best_cnt FROM counts
        GROUP BY doc_id) b
    ON b.doc_id = c.doc_id AND c.cnt = b.best_cnt
  GROUP BY c.doc_id),
r AS (
  SELECT b.doc_id, b.n_lines,
    CAST(round((b.n_lines - len(list_distinct(b.lines))) / b.nzl, 6)
         AS DOUBLE) AS dup_line_ratio,
    CAST(round((b.line_chars - b.uniq_line_chars)
               / greatest(b.line_chars, 1.0), 6)
         AS DOUBLE) AS dup_line_char_ratio,
    CAST(round(CASE WHEN b.n_words >= 2
                    THEN coalesce(t.top_chars, 0) / b.nz_word_chars
                    ELSE 0.0 END, 6)
         AS DOUBLE) AS top_bigram_char_ratio
  FROM base b LEFT JOIN top t USING (doc_id))
SELECT doc_id, n_lines, dup_line_ratio, dup_line_char_ratio,
       top_bigram_char_ratio,
       (dup_line_ratio <= 0.30 AND dup_line_char_ratio <= 0.20
        AND top_bigram_char_ratio <= 0.18) AS repetition_pass
FROM r
"""


# ------------------------------------- deterministic data mixing (r4)

_MIX_FRACTIONS = {"en": 0.5, "de": 0.25}
_MIX_DEFAULT = 0.1
_MIX_SEED = 7


def stratified_sample_mix(spark, sf_dir):
    """Data-mixing primitive (ops/sampling.stratified_sample): keep
    50% of en, 25% of de, 10% of everything else, decided per doc_id
    hash — map-only, partitioning-independent, and reproduced EXACTLY
    by the DuckDB oracle (the whole point: the sample a 100 TB run
    keeps is auditable by any engine with md5).  Returns per-lang
    population vs sampled counts."""
    from log_parser_spark.ops import sampling
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang"))
    kept = sampling.stratified_sample(
        docs, "lang", _MIX_FRACTIONS, key="doc_id",
        default_fraction=_MIX_DEFAULT, seed=_MIX_SEED)
    pop = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    sam = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (pop.join(sam, "lang", "left")
            .select("lang", "n_docs",
                    F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
                    F.round(F.coalesce("n_sampled", F.lit(0))
                            / F.col("n_docs"), 6).alias("sample_rate")))


def _mix_sql():
    from log_parser_spark.ops.sampling import _threshold_hex
    cases = " ".join(
        f"WHEN '{v}' THEN '{_threshold_hex(f)}'"
        for v, f in sorted(_MIX_FRACTIONS.items()))
    return f"""
WITH s AS (SELECT lang, doc_id,
  substr(md5(doc_id::VARCHAR || ':{_MIX_SEED}'), 1, 8) AS h,
  CASE lang {cases} ELSE '{_threshold_hex(_MIX_DEFAULT)}' END AS th
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
  sum(CASE WHEN h < th THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
  CAST(round(sum(CASE WHEN h < th THEN 1 ELSE 0 END)
             / count(*), 6) AS DOUBLE) AS sample_rate
FROM s GROUP BY lang
"""


STRATIFIED_SAMPLE_SQL = _mix_sql()


# ---------------------------------------------- C4 cleaning rules (r4)

def c4_clean(spark, sf_dir):
    """C4 line filter + page flags (ops/cleaning.c4_clean_columns):
    per-doc kept-line counts, sentence count, lorem/brace flags, keep
    verdict, and the md5 of the cleaned text — the md5 pins the
    line-filter semantics across engines."""
    from log_parser_spark.ops import cleaning
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    out = cleaning.c4_clean_columns(docs)
    return out.select(
        "doc_id", "n_lines_total", "n_lines_kept", "n_sentences",
        "has_lorem_ipsum", "has_curly_brace", "c4_keep",
        F.md5("cleaned_text").alias("cleaned_md5"))


C4_CLEAN_SQL = r"""
WITH q AS (SELECT doc_id, text,
  list_filter(string_split(text, chr(10)),
              ln -> regexp_matches(ln, '[^ \t\n\x0B\f\r]')) AS lines
  FROM documents),
k AS (SELECT doc_id, text, lines,
  list_filter(lines, ln ->
     regexp_matches(ln, '[.!?"”][ \t\n\x0B\f\r]*$')
     AND len(list_filter(regexp_split_to_array(ln, '[ \t\n\x0B\f\r]+'), x -> x <> '')) >= 5
     AND NOT contains(lower(ln), 'javascript')) AS kept
  FROM q),
r AS (SELECT doc_id,
  len(lines)::BIGINT AS n_lines_total,
  len(kept)::BIGINT AS n_lines_kept,
  coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
  contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
  contains(text, '{') AS has_curly_brace
  FROM k)
SELECT doc_id, n_lines_total, n_lines_kept,
  len(regexp_extract_all(cleaned, '[.!?]'))::BIGINT AS n_sentences,
  has_lorem_ipsum, has_curly_brace,
  (len(regexp_extract_all(cleaned, '[.!?]')) >= 3
   AND NOT has_lorem_ipsum AND NOT has_curly_brace) AS c4_keep,
  md5(cleaned) AS cleaned_md5
FROM r
"""


# ------------------------------------- curation funnel yield (r4)

_YIELD_SUFFIX = ("\nIt is said that all of the results have to be "
                 "written with care. That is of note and we agree to "
                 "it. We have to be sure of all that.")


def curation_yield(spark, sf_dir):
    """The number a data team actually tracks: per-language document
    and BPE-token yield after the FULL curation funnel — Gopher
    quality x Gopher repetition x C4 cleaning, then the deterministic
    stratified sample.  All three filters are map-only column
    compositions over ONE scan (no joins — the *_columns ops chain on
    the same DataFrame); the only shuffle is the final per-lang
    aggregate.

    The synthetic corpus is punctuation- and stopword-free (every doc
    fails Gopher and C4 as-is), so every EVEN doc_id gets a
    deterministic punctuated suffix line — the funnel then passes
    exactly the enriched docs that clear every rule, which both
    engines must agree on."""
    from log_parser_spark.ops import cleaning, sampling
    from log_parser_spark.ops import text as T
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir).select("doc_id", "lang", "text")
    docs = docs.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(2)) == 0,
               F.concat("text", F.lit(_YIELD_SUFFIX)))
        .otherwise(F.col("text")))
    z = cleaning.c4_clean_columns(
        T.gopher_repetition_columns(T.gopher_quality_columns(docs)))
    # localCheckpoint barrier before the verdict filter (the PLANS.md
    # filter-side HOF-no-CSE rule): pushing the three pass flags into
    # a Filter re-inlines EVERY rule's metric tree with each internal
    # reference re-expanded — measured 73 s vs ~3 s at sf1.0.  The
    # barrier row is (doc_id, lang, text, 3 booleans) — one metric
    # pass, then the filter reads materialized flags.
    z = (z.select("doc_id", "lang", "text", "gopher_pass",
                  "repetition_pass", "c4_keep")
         .localCheckpoint(eager=False))
    passed = z.filter(F.col("gopher_pass") & F.col("repetition_pass")
                      & F.col("c4_keep"))
    kept = sampling.stratified_sample(
        passed, "lang", _MIX_FRACTIONS, key="doc_id",
        default_fraction=_MIX_DEFAULT, seed=_MIX_SEED)
    return (kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum(T.bpe_token_count_col("text")).alias("total_bpe_tokens")))


def _curation_yield_sql():
    from log_parser_spark.ops.sampling import _threshold_hex
    from log_parser_spark.ops.text import BPE_PIECE_PATTERN
    cases = " ".join(
        f"WHEN '{v}' THEN '{_threshold_hex(f)}'"
        for v, f in sorted(_MIX_FRACTIONS.items()))
    bpe = BPE_PIECE_PATTERN.replace("'", "''")
    suffix = _YIELD_SUFFIX.replace("\n", "' || chr(10) || '")
    planted = (f"SELECT doc_id, lang, CASE WHEN doc_id % 2 = 0 "
               f"THEN text || '{suffix}' ELSE text END AS text "
               f"FROM documents")
    # the proven per-filter oracles nest verbatim as CTE bodies
    # (DuckDB allows WITH inside a parenthesized CTE definition) with
    # their `documents` reference retargeted at the planted variant
    # (shadowing the name itself would be a circular CTE reference)
    def on_planted(sql):
        return sql.replace("FROM documents", "FROM planted_documents")
    return f"""
WITH planted_documents AS ({planted}),
gq AS ({on_planted(GOPHER_QUALITY_SQL)}),
gr AS ({on_planted(GOPHER_REPETITION_SQL)}),
cc AS ({on_planted(C4_CLEAN_SQL)}),
flags AS (
  SELECT d.doc_id, d.lang, d.text FROM planted_documents d
  JOIN gq ON gq.doc_id = d.doc_id
  JOIN gr ON gr.doc_id = d.doc_id
  JOIN cc ON cc.doc_id = d.doc_id
  WHERE gq.gopher_pass AND gr.repetition_pass AND cc.c4_keep),
s AS (
  SELECT doc_id, lang, text FROM flags
  WHERE substr(md5(doc_id::VARCHAR || ':{_MIX_SEED}'), 1, 8) <
        CASE lang {cases} ELSE '{_threshold_hex(_MIX_DEFAULT)}' END)
SELECT lang, count(*)::BIGINT AS n_docs_kept,
  CAST(sum(len(regexp_extract_all(text, '{bpe}'))) AS BIGINT)
    AS total_bpe_tokens
FROM s GROUP BY lang
"""


# ------------------------------------- inter-doc boilerplate (r4)

_BOILER_FOOTER = ("Cookie notice: this site uses cookies. "
                  "All rights reserved.")


def boilerplate_stats(spark, sf_dir):
    """Cross-document boilerplate detection
    (ops/dedup.boilerplate_paragraphs): plant a shared footer on every
    third doc — the op must flag exactly that paragraph (>= 3 distinct
    docs) while every unique body line stays clean."""
    from log_parser_spark.ops import dedup
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(3)) == 0,
               F.concat("text", F.lit("\n" + _BOILER_FOOTER)))
        .otherwise(F.col("text")))
    return dedup.boilerplate_paragraphs(planted, min_doc_freq=3)


BOILERPLATE_SQL = rf"""
WITH d AS (SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || '{_BOILER_FOOTER}'
       ELSE text END AS text
  FROM documents),
p AS (SELECT doc_id,
  unnest(list_filter(string_split(text, chr(10)),
                     ln -> regexp_matches(ln, '[^ \t\n\x0B\f\r]'))) AS para FROM d),
f AS (SELECT md5(para) AS ph, count(DISTINCT doc_id) AS doc_freq
      FROM p GROUP BY md5(para)),
pd AS (SELECT doc_id, count(*) AS n_paras, sum(length(para)) AS chars
       FROM p GROUP BY doc_id),
pb AS (SELECT doc_id, count(*) AS n_boiler_paras,
              sum(length(para)) AS bchars
       FROM p WHERE md5(para) IN (SELECT ph FROM f WHERE doc_freq >= 3)
       GROUP BY doc_id)
SELECT pd.doc_id, pd.n_paras::BIGINT AS n_paras,
  coalesce(pb.n_boiler_paras, 0)::BIGINT AS n_boiler_paras,
  CAST(round(coalesce(pb.bchars, 0) / greatest(pd.chars, 1), 6)
       AS DOUBLE) AS boiler_char_ratio
FROM pd LEFT JOIN pb USING (doc_id)
"""


# ------------------------------------------------- PII scrubbing (r4)

def pii_scrub(spark, sf_dir):
    """PII detect + redact (ops/text.redact_pii_columns): plant one
    deterministic email / phone / IPv4 per document, then count and
    redact — the per-type counts and the md5 of the redacted text must
    agree with the DuckDB mirror running the SAME RE2-compatible
    patterns, which pins the chained-regexp_replace semantics across
    engines."""
    from log_parser_spark.ops import text as T
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    d = F.col("doc_id").cast("string")
    planted = docs.withColumn("text", F.concat(
        "text",
        F.lit(" contact user"), d, F.lit("@example.com at +1-555-010-"),
        F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        F.pmod("doc_id", F.lit(256)).cast("string"), F.lit(".7")))
    out = T.redact_pii_columns(planted)
    return out.select(
        "doc_id", "n_emails", "n_ips", "n_phones",
        F.md5("redacted_text").alias("redacted_md5"))


_PII_PLANT_SQL = ("text || ' contact user' || doc_id::VARCHAR"
                  " || '@example.com at +1-555-010-'"
                  " || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
                  " || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7'")

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_PHONE = r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]?\d{0,4}"

# counts are PROGRESSIVE (each type counted after the prior type's
# redaction, mirroring ops/text.redact_pii_columns), so n_<type>s ==
# placeholders present in the redacted text even when matches overlap
PII_SCRUB_SQL = f"""
WITH p AS (SELECT doc_id, {_PII_PLANT_SQL} AS text FROM documents),
s1 AS (SELECT doc_id,
  len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_emails,
  regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM p),
s2 AS (SELECT doc_id, n_emails,
  len(regexp_extract_all(t1, '{_PII_IP}'))::BIGINT AS n_ips,
  regexp_replace(t1, '{_PII_IP}', '<IP>', 'g') AS t2
  FROM s1)
SELECT doc_id, n_emails, n_ips,
  len(regexp_extract_all(t2, '{_PII_PHONE}'))::BIGINT AS n_phones,
  md5(regexp_replace(t2, '{_PII_PHONE}', '<PHONE>', 'g'))
    AS redacted_md5
FROM s2
"""


# -------------------------------------------- ANN recall accounting (r4)

def ann_recall_ivf(spark, sf_dir):
    """recall@k of ivf_topk vs brute_force_topk per n_probe — the
    evidence that makes 100 TB probe-tuning measurable instead of
    guessed (ops/similarity.py:123,193 contract).  One row per probe
    setting: n_hits = |ivf top-k ∩ exact top-k| over all queries,
    recall_at_k = n_hits / (n_queries * k).  Fully declarative: the
    three probe runs are unioned and semi-joined against the exact
    set; the truth size rides in via a broadcast 1-row crossJoin (no
    driver-side counting).

    Expected values on THIS corpus are low (0.2-0.5) by construction:
    the synthetic embeddings are i.i.d. random, i.e. near-orthogonal —
    the ANN-hostile worst case where true neighbors scatter across
    centroid cells.  That is the point of the query: it measures, per
    probe budget, exactly how hostile the corpus is (clustered
    real-world embeddings score far higher — see
    tests/test_ops.py::test_ivf_topk_recall, >= 0.5 at n_probe=2 on
    smooth data), so probe tuning is evidence-based either way."""
    from log_parser_spark.ops import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    k, n_centroids = 5, 16
    truth = similarity.brute_force_topk(emb, queries, k=k).select(
        "query_id", "neighbor_id")
    return _recall_per_probe(emb, queries, truth, k, n_centroids)


def _recall_per_probe(emb, queries, truth, k, n_centroids,
                      probes=(1, 2, 4)):
    """Shared recall-accounting tail for the two ann_recall_* queries:
    run ivf_topk once per probe setting, intersect with the exact
    top-k, and report one row PER PROBED SETTING — the per-probe hit
    counts are left-joined onto the static probe list so a leg with
    zero hits reports recall_at_k = 0.0 instead of silently dropping
    its row (a consumer keyed on n_probe must see every probed leg;
    same coalesce-to-zero contract as ngram_contamination)."""
    from log_parser_spark.ops import similarity
    tagged = None
    for n_probe in probes:
        a = (similarity.ivf_topk(emb, queries, k=k,
                                 n_centroids=n_centroids, n_probe=n_probe)
             .select("query_id", "neighbor_id")
             .withColumn("n_probe", F.lit(n_probe)))
        tagged = a if tagged is None else tagged.unionByName(a)
    hits = tagged.join(truth, ["query_id", "neighbor_id"], "left_semi")
    per = hits.groupBy("n_probe").agg(
        F.count(F.lit(1)).alias("n_hits"))
    probe_rows = emb.sparkSession.range(1).select(F.explode(F.array(
        *[F.lit(p) for p in probes])).alias("n_probe"))
    per = (probe_rows.join(per, "n_probe", "left")
           .select("n_probe",
                   F.coalesce("n_hits", F.lit(0)).cast("long")
                   .alias("n_hits")))
    tn = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (per.crossJoin(F.broadcast(tn))
            .select(F.lit(n_centroids).alias("n_centroids"), "n_probe",
                    F.lit(k).alias("k"), "n_hits", "n_truth",
                    F.round(F.col("n_hits") / F.col("n_truth"), 4)
                    .alias("recall_at_k")))


def ann_recall_clustered(spark, sf_dir):
    """ann_recall_ivf's planted-cluster companion: the sf embeddings
    are i.i.d. random (near-orthogonal — the ANN-hostile worst case,
    recall 0.2-0.5 by construction), so this query rebuilds the SAME
    row set as a 24-cluster corpus (centroid = cos() of the cluster
    index, + 5% sin() noise — pure codegen, deterministic, no extra
    input data) and reports recall per n_probe on it.  On clustered
    data — the realistic shape of text-embedding corpora — IVF must
    recover >= 0.5 of the exact top-k at moderate probes (pinned by
    tests/test_ops.py::test_ann_recall_clustered_query); together the
    two queries bound the probe-tuning envelope a 100 TB ANN run
    needs: hostile floor and realistic operating point."""
    from log_parser_spark.ops import similarity
    ids = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id"))
    cl = F.pmod("vec_id", F.lit(24)).cast("double")
    vid = F.col("vec_id").cast("double")
    emb = ids.withColumn("embedding", F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: (F.cos(cl * F.lit(37.0) + j.cast("double") * F.lit(17.0))
                   + F.lit(0.05)
                   * F.sin(vid * F.lit(13.0) + j.cast("double") * F.lit(7.0))
                   ).cast("float")))
    queries = emb.filter(F.col("vec_id") < 10)
    k, n_centroids = 5, 16
    truth = similarity.brute_force_topk(emb, queries, k=k).select(
        "query_id", "neighbor_id")
    return _recall_per_probe(emb, queries, truth, k, n_centroids)


# ---------------------------------------- near-dup cluster assignment (r5)

def dedup_cluster_assignment(spark, sf_dir):
    """Pairs -> CLUSTERS (ops/dedup.connected_components): the step
    every near-dedup pipeline ends with — pick one representative per
    connected component of the candidate-pair graph.  The corpus
    plants overlapping-window CHAINS (docs with id % 10 in 0..3 get
    text = window(k) + window(k+1) of their group), so adjacent pairs
    share exactly one 20-token block: jaccard links 0-1-2-3 but not
    0-2 directly, and the component is only recoverable by actual
    label PROPAGATION, not by pairwise grouping.  Spark runs the
    iterative min-label loop; the DuckDB oracle reproduces it with a
    recursive CTE — an exact cross-engine check of an iterative graph
    algorithm."""
    from log_parser_spark.ops import dedup
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    g = F.floor(F.col("doc_id") / 10).cast("long")
    k = F.pmod("doc_id", F.lit(10))

    def window_block(kk):
        return F.array_join(F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda j: F.concat_ws(
                "_", F.concat(F.lit("c"), g.cast("string")),
                kk.cast("string"), j.cast("string"))), " ")

    planted = docs.withColumn(
        "text",
        F.when(k <= 3,
               F.concat(window_block(k), F.lit(" "),
                        window_block(k + 1)))
        .otherwise(F.col("text")))
    edges = _cluster_assignment_edges(spark, planted)
    return dedup.connected_components(edges).select(
        F.col("node").alias("doc_id"), "component", "cluster_size")


def _cluster_assignment_edges(spark, planted):
    """Edge construction for dedup_cluster_assignment, exposed so
    tests/test_plans.py can pin its plan SHAPE (the checkpoint barrier
    below is a measured 15-30x cliff if refactored away).

    Pair set: (doc_id, doc_id + 1) where both ends exist — the by-id
    verify's inner joins reproduce exactly the old text-level
    a.join(b, b == a + 1), while shingling each doc once instead of
    once per pair side (ops/dedup.ngram_jaccard_by_id; the per-doc
    shingle stage key-repartitions first, which keeps the heavy HOF
    work off the single-task scan — the small-bytes/heavy-compute trap
    from PLANS.md).

    The localCheckpoint barrier before the threshold filter is still
    load-bearing: predicate pushdown would substitute the filter
    through the staging projections and re-inline the jaccard tree
    (the filter-side sibling of the HOF-no-CSE rule in PLANS.md)."""
    from log_parser_spark.ops import dedup
    pairs = planted.select(F.col("doc_id").alias("a"),
                           (F.col("doc_id") + 1).alias("b"))
    jac = (dedup.ngram_jaccard_by_id(pairs, planted)
           .select("a", "b", "jaccard").localCheckpoint(eager=False))
    return jac.filter(F.col("jaccard") >= 0.2).select("a", "b")


DEDUP_CLUSTER_SQL = r"""
WITH RECURSIVE planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 <= 3 THEN
      array_to_string(list_transform(generate_series(1, 20),
        j -> 'c' || (doc_id // 10) || '_' || (doc_id % 10) || '_' || j),
        ' ')
      || ' ' ||
      array_to_string(list_transform(generate_series(1, 20),
        j -> 'c' || (doc_id // 10) || '_' || (doc_id % 10 + 1) || '_' || j),
        ' ')
    ELSE text END AS text
  FROM documents),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS t
  FROM planted),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 0)),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks),
jac AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(round(CASE
           WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
           THEN len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE
           ELSE 0.0 END, 6) AS DOUBLE) AS jaccard
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1),
edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.2),
bidir AS (SELECT a AS s, b AS d FROM edges
          UNION SELECT b, a FROM edges),
nodes AS (SELECT DISTINCT s AS node FROM bidir),
walk(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT bd.d, w.lbl FROM walk w JOIN bidir bd ON bd.s = w.node),
labels AS (SELECT node, min(lbl) AS component FROM walk GROUP BY node),
sizes AS (SELECT component, count(*)::BIGINT AS cluster_size
          FROM labels GROUP BY component)
SELECT labels.node AS doc_id, labels.component, sizes.cluster_size
FROM labels JOIN sizes USING (component)
"""


# ------------------- end-to-end near-dedup pipeline clusters (round 6)

def dedup_pipeline_clusters(spark, sf_dir):
    """The PRODUCTION near-dedup composition end to end — candidate
    generation (ops/dedup.minhash_lsh_pairs), exact n-gram jaccard
    verification, connected_components — on the corpus itself, not on
    planted adjacent pairs (dedup_cluster_assignment's scope).  The
    published pipeline shape: LSH proposes, exact jaccard disposes, CC
    labels.

    Planting: docs with id % 25 <= 4 become SLIDING WINDOWS over their
    group's synthetic token stream (window 60 tokens, stride 12), so
    adjacent chain members share 48 tokens — exact 3-gram jaccard
    46/70 ~ 0.657 — while members two apart sit at 34/82 ~ 0.415: a
    0.5 threshold links exactly the adjacent pairs and the component
    is a 5-chain recoverable only by label propagation.

    Cross-engine contract: the DuckDB oracle computes the SAME edge
    set relationally (shingle inverted-index candidates -> exact
    jaccard >= 0.5) and walks it with a recursive CTE.  The Spark side
    gates candidates through LSH at 16 bands x 1 row, where the miss
    probability of a true j >= 0.5 pair is (1-j)^16 <= 1.5e-5 — and
    the xxhash64 minhashes are deterministic, so the match is stable,
    not sampled; exact-duplicate texts bypass LSH entirely via the
    star-pair path (a star and the oracle's clique label identical
    components).  Plan hygiene per PLANS.md: key-repartition before
    the jaccard HOFs, localCheckpoint barrier before the threshold
    filter."""
    from log_parser_spark.ops import dedup
    from log_parser_spark.queries import _docs_spread
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    g = F.floor(F.col("doc_id") / 25).cast("long")
    k = F.pmod("doc_id", F.lit(25))
    start = k.cast("long") * 12
    win = F.array_join(F.transform(
        F.sequence(start + 1, start + 60),
        lambda j: F.concat(F.lit("g"), g.cast("string"),
                           F.lit("_t"), j.cast("string"))), " ")
    planted = docs.withColumn(
        "text", F.when(k <= 4, win).otherwise(F.col("text")))

    edges = _pipeline_cluster_edges(spark, planted)
    return dedup.connected_components(edges, max_iters=20).select(
        F.col("node").alias("doc_id"), "component", "cluster_size")


def _pipeline_cluster_edges(spark, planted):
    """Edge construction for dedup_pipeline_clusters (LSH candidates ->
    exact-jaccard verify), exposed so tests/test_plans.py can pin the
    checkpoint-barrier plan shape (PLANS.md round-5 rule).

    The verify is the BY-ID variant (ops/dedup.ngram_jaccard_by_id):
    per-doc shingle sets computed once and attached to each candidate
    side by id, instead of joining both full texts and re-shingling
    them per pair — at sf1.0 the LSH stage emits 10.07M candidates
    over 50k docs, so the per-pair re-shingle was ~400x redundant
    (measured 78 s -> ~3 s for the verify stage)."""
    from log_parser_spark.ops import dedup
    # dedup_pairs stays True: the dropDuplicates both collapses the
    # per-shared-band copies of true pairs (a j>=0.5 pair shares MANY
    # bands) and re-spreads the skewed bucket-join layout before the
    # verify (measured 13.6 s vs 27.7 s for the edge stage without it)
    cand = (dedup.minhash_lsh_pairs(planted, num_perm=16, bands=16)
            .select("a", "b"))
    jac = (dedup.ngram_jaccard_by_id(cand, planted)
           .select("a", "b", "jaccard").localCheckpoint(eager=False))
    return jac.filter(F.col("jaccard") >= 0.5).select("a", "b")


DEDUP_PIPELINE_SQL = r"""
WITH RECURSIVE planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 25 <= 4 THEN
      array_to_string(list_transform(
        generate_series((doc_id % 25) * 12 + 1, (doc_id % 25) * 12 + 60),
        j -> 'g' || (doc_id // 25) || '_t' || j), ' ')
    ELSE text END AS text
  FROM documents),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS t
  FROM planted),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 0)),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks),
ex AS (SELECT doc_id, unnest(s) AS gsh FROM sh),
-- per-doc shingle lists are DISTINCT, so the shared-shingle count c
-- from the inverted-index join is exactly |sa ∩ sb| and jaccard is
-- c / (|sa| + |sb| - c): no per-pair list materialization (the
-- list_intersect formulation was ~100x slower at sf0.1)
cand AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         FROM ex x JOIN ex y ON x.gsh = y.gsh AND x.doc_id < y.doc_id
         GROUP BY 1, 2),
sz AS (SELECT doc_id, len(s) AS ns FROM sh),
jac AS (
  SELECT cand.a, cand.b,
         CAST(round(cand.c::DOUBLE
                    / (sa.ns + sb.ns - cand.c)::DOUBLE, 6) AS DOUBLE)
           AS jaccard
  FROM cand
  JOIN sz sa ON sa.doc_id = cand.a
  JOIN sz sb ON sb.doc_id = cand.b),
edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.5),
bidir AS (SELECT a AS s, b AS d FROM edges
          UNION SELECT b, a FROM edges),
nodes AS (SELECT DISTINCT s AS node FROM bidir),
walk(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT bd.d, w.lbl FROM walk w JOIN bidir bd ON bd.s = w.node),
labels AS (SELECT node, min(lbl) AS component FROM walk GROUP BY node),
sizes AS (SELECT component, count(*)::BIGINT AS cluster_size
          FROM labels GROUP BY component)
SELECT labels.node AS doc_id, labels.component, sizes.cluster_size
FROM labels JOIN sizes USING (component)
"""


# ------------------------------------- temperature mixing weights (r5)

_MIX_ALPHA = 0.3
_MIX_TOKEN_BUDGET = 100_000.0


def temperature_mix_weights(spark, sf_dir):
    """The data-mixing planner (ops/sampling.temperature_mix_weights):
    per-source token counts -> n^alpha temperature weights -> the
    deterministic per-source sampling fraction that realizes a
    100k-token budget.  This is the op that produces the fractions
    stratified_sample consumes; together they close the mixing loop
    (plan the mix, then draw it reproducibly).  Tokens are the BPE
    estimator so the budget is in model tokens, not whitespace
    words."""
    from log_parser_spark.ops import sampling
    from log_parser_spark.ops import text as T
    # plain read, deliberately not _docs_spread: cold A/B measured the
    # spread variant ~0.9 s SLOWER (2.1-2.3 vs 1.1-1.4 s) from extra
    # plan/codegen stages, for a ~0.1 s warm gain — and the driver's
    # protocol runs each query once per process (cold)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("source", T.bpe_token_count_col("text").alias("n_bpe")))
    out = sampling.temperature_mix_weights(
        docs, "source", "n_bpe", alpha=_MIX_ALPHA,
        token_budget=_MIX_TOKEN_BUDGET)
    return out.select("source", "n_docs", "n_tokens", "weight",
                      "sample_fraction")


def _temperature_mix_sql():
    from log_parser_spark.ops.text import BPE_PIECE_PATTERN
    bpe = BPE_PIECE_PATTERN.replace("'", "''")
    return f"""
WITH d AS (
  SELECT source,
         len(regexp_extract_all(text, '{bpe}')) AS n_bpe
  FROM documents),
a AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         CAST(sum(n_bpe) AS BIGINT) AS n_tokens,
         pow(sum(n_bpe)::DOUBLE, {_MIX_ALPHA}) AS w
  FROM d GROUP BY source),
t AS (SELECT sum(w) AS tw FROM a)
SELECT source, n_docs, n_tokens,
       CAST(round(w / tw, 6) AS DOUBLE) AS weight,
       CAST(round(CASE WHEN n_tokens > 0
                       THEN least(1.0, {_MIX_TOKEN_BUDGET} * (w / tw)
                                        / n_tokens::DOUBLE)
                       ELSE 0.0 END, 6) AS DOUBLE)
         AS sample_fraction
FROM a CROSS JOIN t
"""


# ---------------------------------------- benchmark decontamination (r5)

_EVAL_SENTENCE = ("the quick benchmark sentence that must never leak "
                  "into any training corpus at all")


def ngram_contamination(spark, sf_dir):
    """Train/eval overlap check (ops/dedup.ngram_contamination): every
    97th doc is the planted EVAL set, and every doc with id % 10 == 3
    gets the eval marker sentence appended — the op must count exactly
    the 7 sentence-internal 8-gram collisions on those docs (14 tokens
    -> 7 distinct 8-grams), flag the eval docs themselves at ratio
    1.0, and leave everything else clean.  Broadcast-semi-join shape:
    the eval shingle set is benchmark-sized, so at 100 TB the train
    side never shuffles shingles — one combinable groupBy on doc_id."""
    from log_parser_spark.ops import dedup
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    planted = docs.withColumn(
        "text",
        F.when((F.pmod("doc_id", F.lit(97)) == 0)
               | (F.pmod("doc_id", F.lit(10)) == 3),
               F.concat("text", F.lit("\n" + _EVAL_SENTENCE)))
        .otherwise(F.col("text")))
    eval_docs = planted.filter(F.pmod("doc_id", F.lit(97)) == 0)
    # eval_join pinned: the planted eval set is benchmark-sized by
    # construction, so skip the auto-mode probe count
    return dedup.ngram_contamination(planted, eval_docs, k=8,
                                     eval_join="broadcast")


def _contamination_sql():
    sent = _EVAL_SENTENCE
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 OR doc_id % 10 = 3
              THEN text || chr(10) || '{sent}' ELSE text END AS text
  FROM documents),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS t
  FROM planted),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 8 THEN
           list_distinct(list_transform(
             generate_series(1, len(t) - 7),
             i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                      t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                      t[i+6] || ' ' || t[i+7])))
         ELSE []::VARCHAR[] END AS s
  FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE doc_id % 97 = 0),
probe AS (SELECT doc_id, unnest(s) AS h FROM sh),
hits AS (SELECT doc_id, count(*) AS n_contaminated
         FROM probe JOIN ev USING (h) GROUP BY doc_id)
SELECT sh.doc_id, len(sh.s)::INTEGER AS n_shingles,
       coalesce(hits.n_contaminated, 0)::BIGINT AS n_contaminated,
       CAST(round(coalesce(hits.n_contaminated, 0)
                  / greatest(len(sh.s)::DOUBLE, 1.0), 6) AS DOUBLE)
         AS contamination_ratio,
       coalesce(hits.n_contaminated, 0) > 0 AS is_contaminated
FROM sh LEFT JOIN hits USING (doc_id)
"""


# ------------------------------------------------------------- registry

QUERIES_EXT = {
    "log_histograms_last": log_histograms_last,
    "log_counters_grid": log_counters_grid,
    "log_histograms_grid": log_histograms_grid,
    "log_user_opers": log_user_opers,
    "log_delete_opers": log_delete_opers,
    "log_table_creation_stats": log_table_creation_stats,
    "log_largest_compaction": log_largest_compaction,
    "log_files": log_files,
    "log_live_files": log_live_files,
    "log_running_live_size": log_running_live_size,
    "log_read_density": log_read_density,
    "log_mem_reports": log_mem_reports,
    "log_cumulative_writes": log_cumulative_writes,
    "log_cf_stalls": log_cf_stalls,
    "log_cf_lifetime": log_cf_lifetime,
    "log_job_cf": log_job_cf,
    "log_quarantine_stats": log_quarantine_stats,
    "url_canonical_dedup": url_canonical_dedup,
    "url_canonical_sorted": url_canonical_sorted,
    "lsh_drop_accounting": lsh_drop_accounting,
    "cosine_drop_accounting": cosine_drop_accounting,
    "ann_recall_ivf": ann_recall_ivf,
    "ann_recall_clustered": ann_recall_clustered,
    "gopher_quality": gopher_quality,
    "gopher_repetition": gopher_repetition,
    "pii_scrub": pii_scrub,
    "c4_clean": c4_clean,
    "stratified_sample_mix": stratified_sample_mix,
    "boilerplate_stats": boilerplate_stats,
    "curation_yield": curation_yield,
    "ngram_contamination": ngram_contamination,
    "temperature_mix_weights": temperature_mix_weights,
    "dedup_cluster_assignment": dedup_cluster_assignment,
    "dedup_pipeline_clusters": dedup_pipeline_clusters,
}

ORACLE_SQL_EXT = {
    "log_histograms_last": LOG_HISTOGRAMS_LAST_SQL,
    "log_counters_grid": LOG_COUNTERS_GRID_SQL,
    "log_histograms_grid": LOG_HISTOGRAMS_GRID_SQL,
    "log_user_opers": LOG_USER_OPERS_SQL,
    "log_delete_opers": LOG_DELETE_OPERS_SQL,
    "log_table_creation_stats": LOG_TABLE_CREATION_SQL,
    "log_largest_compaction": LOG_LARGEST_COMPACTION_SQL,
    "log_files": LOG_FILES_SQL,
    "log_live_files": LOG_LIVE_FILES_SQL,
    "log_running_live_size": LOG_RUNNING_LIVE_SQL,
    "log_read_density": LOG_READ_DENSITY_SQL,
    "log_mem_reports": LOG_MEM_REPORTS_SQL,
    "log_cumulative_writes": LOG_CUMULATIVE_WRITES_SQL,
    "log_cf_stalls": LOG_CF_STALLS_SQL,
    "log_cf_lifetime": LOG_CF_LIFETIME_SQL,
    "log_job_cf": LOG_JOB_CF_SQL,
    "log_quarantine_stats": LOG_QUARANTINE_SQL,
    "url_canonical_dedup": URL_CANONICAL_SQL,
    "url_canonical_sorted": URL_CANONICAL_SORTED_SQL,
    "gopher_quality": GOPHER_QUALITY_SQL,
    "gopher_repetition": GOPHER_REPETITION_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "c4_clean": C4_CLEAN_SQL,
    "stratified_sample_mix": STRATIFIED_SAMPLE_SQL,
    "boilerplate_stats": BOILERPLATE_SQL,
    "curation_yield": _curation_yield_sql(),
    "ngram_contamination": _contamination_sql(),
    "temperature_mix_weights": _temperature_mix_sql(),
    "dedup_cluster_assignment": DEDUP_CLUSTER_SQL,
    "dedup_pipeline_clusters": DEDUP_PIPELINE_SQL,
}

# -------------------------------------------- golden-parquet oracles
#
# The hash/LSH/ANN queries and the nested JSON report are deterministic
# (seeded corpus, xxhash64/md5 hashing, seeded sampling) but not
# recomputable in DuckDB SQL.  Their oracle is a GOLDEN PARQUET staged
# at sf0.01 — the scale the driver runs the correctness gate at — by
# tools/stage_golden.py; tests/test_golden_artifacts.py re-runs each
# query live and pins golden == live, so a parser/op change that moves
# any output forces a restage (same contract as log_records.parquet).
# log_parsed_json_report additionally has byte parity vs the REFERENCE
# renderer in tests/test_json_parity.py, so its golden transitively
# carries reference semantics.

GOLDEN_QUERIES = [
    "doc_fingerprints",
    "minhash_pairs",
    "simhash_docs",
    "simhash_near_pairs",
    "embedding_ann_ivf",
    "embedding_cosine_dedup",
    "cosine_drop_accounting",
    "ann_recall_ivf",
    "ann_recall_clustered",
    "lsh_drop_accounting",
    "log_parsed_json_report",
]

for _name in GOLDEN_QUERIES:
    ORACLE_SQL_EXT[_name] = (
        "SELECT * FROM read_parquet("
        f"'{data_path('golden', _name + '.parquet')}')")
