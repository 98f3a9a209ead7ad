"""Structured Streaming variant of the pipeline (SURVEY §2.8).

The reference is single-shot batch, and the north rule's resumability is
satisfied by the batch lineage table — but a continuously-ingesting
deployment (new WARC drops appearing under a prefix) maps naturally to
a file-source stream.  `foreachBatch` reuses the exact batch routing
code, so stream and batch stay semantically identical; the stream's
checkpointLocation provides exactly-once file-source progress on top.

`Trigger.AvailableNow` drains everything currently present and stops —
the bounded-catch-up mode the driver/test uses.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from log_parser_spark.engine import branches, sinks
from log_parser_spark.engine.parse import parse_pages
from log_parser_spark.engine.schema import PAGES_SCHEMA

STREAM_SINKS = ["counters_csv", "histograms_csv", "compaction_stats",
                "flush_events", "files", "quarantine"]


def _route_batch(batch_df, batch_id: int, out_dir: str):
    records = parse_pages(batch_df)
    rec_path = os.path.join(out_dir, "records", f"batch={batch_id}")
    records.write.mode("overwrite").parquet(rec_path)
    records = batch_df.sparkSession.read.parquet(rec_path)

    builders = {
        "counters_csv": lambda: sinks.counters_sink(
            branches.counters(records)),
        "histograms_csv": lambda: sinks.histograms_sink(
            branches.histograms(records)),
        "compaction_stats": lambda: sinks.compaction_stats_sink(
            branches.comp_stats(records)),
        "flush_events": lambda: sinks.flushes_sink(
            branches.events(records), branches.cf_registry(records)),
        "files": lambda: sinks.files_sink(branches.events(records)),
        "quarantine": lambda: branches.quarantine(records),
    }
    for name in STREAM_SINKS:
        builders[name]().write.mode("overwrite").parquet(
            os.path.join(out_dir, name, f"batch={batch_id}"))


def stream_pipeline(spark: SparkSession, pages_dir: str, out_dir: str,
                    checkpoint_dir: str, available_now: bool = True,
                    max_files_per_trigger: int = 16):
    """Returns the started StreamingQuery."""
    stream = (spark.readStream
              .schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(pages_dir))

    writer = (stream.writeStream
              .foreachBatch(lambda df, bid: _route_batch(df, bid, out_dir))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
