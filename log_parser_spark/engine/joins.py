"""Relational joins over the events branch (SURVEY §2.3 J1-J5).

All join keys include ``url``, so after the parse stage's repartition by
url-hash everything is per-document colocated; at cluster scale these
are narrow shuffles on (url, job_id/file_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (start, finish, flow) triples — events.py:113-119.  Recovery is listed
# for parity with the reference's event model, but can never produce
# pairs today: the parser (matching events.py:216-230) routes recovery
# events to quarantine as unsupported, so flow_pairs(events, "Recovery")
# is always empty by construction.
MATCHING_EVENTS = [
    ("flush_started", "flush_finished", "Flush"),
    ("compaction_started", "compaction_finished", "Compaction"),
    ("recovery_started", "recovery_finished", "Recovery"),
]


def job_cf_map(records: DataFrame) -> DataFrame:
    """J1: first-wins job_id -> cf_name map (log_file.py:256-269)."""
    return records.filter(F.col("kind") == "job_cf").select(
        "url", "job_id", F.col("cf").alias("job_cf")).dropDuplicates(
        ["url", "job_id"])


def flow_pairs(events: DataFrame, flow: str) -> DataFrame:
    """J3: start/finish pairing per (url, job_id, cf), with the
    reference's exact incremental-matching semantics (events.py:910-931
    + 435-460): each finish binds to the MOST RECENT already-seen start
    of the same (job, cf) — even one that was already matched, in which
    case the earlier match is overwritten — so a start ends up paired
    with the LAST finish that bound to it, and superseded starts stay
    unmatched.

    Declarative shape: a running 'last start seq' window assigns every
    finish its matched start (as-of), then max_by(finish, seq) per start
    keeps the overwrite winner.  One shuffle on (url, job_id, cf); for
    well-formed logs (one start + one finish per job) this degenerates
    to the obvious 1:1 pairing."""
    start_t, finish_t, _ = next(m for m in MATCHING_EVENTS if m[2] == flow)

    flow_events = events.filter(
        F.col("event_type").isin(start_t, finish_t))
    w = (Window.partitionBy("url", "job_id", "cf").orderBy("seq")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tagged = flow_events.withColumn(
        "_start_seq",
        F.last(F.when(F.col("event_type") == start_t, F.col("seq")),
               ignorenulls=True).over(w))

    s = tagged.filter(F.col("event_type") == start_t).select(
        "url", "job_id", "cf",
        F.col("ts").alias("start_ts"), F.col("seq").alias("start_seq"),
        F.col("time_micros").alias("start_micros"),
        F.col("payload_json").alias("start_payload"),
        F.col("wal_id").alias("wal_id"),
        F.col("p").alias("start_p"))
    f = (tagged.filter((F.col("event_type") == finish_t)
                       & F.col("_start_seq").isNotNull())
         .groupBy("url", "job_id", "cf",
                  F.col("_start_seq").alias("start_seq"))
         .agg(F.max_by(F.struct(
             F.col("ts").alias("finish_ts"),
             F.col("seq").alias("finish_seq"),
             F.col("time_micros").alias("finish_micros"),
             F.col("payload_json").alias("finish_payload"),
             F.col("p").alias("finish_p")), "seq").alias("fin")))
    f = f.select("url", "job_id", "cf", "start_seq",
                 "fin.finish_ts", "fin.finish_seq", "fin.finish_micros",
                 "fin.finish_payload", "fin.finish_p")

    paired = s.join(f, ["url", "job_id", "cf", "start_seq"], "left")
    return paired.withColumn(
        "duration_ms",
        ((F.col("finish_micros") - F.col("start_micros")) / 1000)
        .cast("long"))


def compaction_jobs(events: DataFrame, prefinish: DataFrame) -> DataFrame:
    """J3+J4: finished compaction jobs enriched with the textual
    pre-finish stats line, matched on (url, cf, records_in ==
    num_input_records) with first-match-in-document-order consumption
    (compactions.py:204-219)."""
    pairs = (flow_pairs(events, "Compaction")
             .filter(F.col("finish_ts").isNotNull())
             .withColumn("records_in",
                         F.col("finish_p.num_input_records")))

    w_fin = Window.partitionBy("url", "cf", "records_in").orderBy("finish_seq")
    pairs = pairs.withColumn("match_rk", F.row_number().over(w_fin))

    w_pre = Window.partitionBy("url", "cf", "records_in").orderBy("seq")
    pre = (prefinish
           .withColumn("match_rk", F.row_number().over(w_pre))
           .select("url", "cf", "records_in", "match_rk",
                   "read_rate_mbps", "write_rate_mbps",
                   "read_write_amplify", "write_amplify", "records_dropped"))

    return pairs.join(pre, ["url", "cf", "records_in", "match_rk"], "left")


def file_lifecycle(events: DataFrame) -> DataFrame:
    """J5: table_file_creation x table_file_deletion per (url, file_number)
    (db_files.py:180-241).  Files deleted without a creation event are
    excluded (csv_outputter.py:441-446)."""
    base = events.filter(
        F.col("event_type").isin("table_file_creation",
                                 "table_file_deletion")).select(
        "url", F.col("p.file_number").alias("file_number"), "event_type",
        "ts", "seq", "cf", "job_id", "payload_json", "p")

    grouped = base.groupBy("url", "file_number").agg(
        F.min_by(F.struct("ts", "cf", "job_id", "payload_json", "p"),
                 F.when(F.col("event_type") == "table_file_creation",
                        F.col("seq"))).alias("created"),
        F.min_by(F.struct("ts", "seq"),
                 F.when(F.col("event_type") == "table_file_deletion",
                        F.col("seq"))).alias("deleted"),
        F.min("seq").alias("first_seq"),
    )
    return grouped.filter(F.col("created.ts").isNotNull()).select(
        "url", "file_number", F.col("first_seq").alias("seq"),
        F.col("created.ts").alias("created_ts"),
        F.col("created.cf").alias("cf"),
        F.col("created.job_id").alias("job_id"),
        F.col("created.payload_json").alias("creation_payload"),
        F.col("created.p").alias("p"),
        F.col("deleted.ts").alias("deleted_ts"),
        F.when(F.col("deleted.ts").isNotNull(), "Deleted")
        .otherwise("Alive").alias("status"))
