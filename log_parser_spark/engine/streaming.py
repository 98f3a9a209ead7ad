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


def watermarked_event_window_counts(events_stream, window: str = "1 minute",
                                    watermark: str = "2 minutes",
                                    ts_col: str = "ts"):
    """Event-time windowed counts with a watermark for late data
    (SURVEY §2.8 / north rule): counts per (event-time window,
    event_type).  Late rows inside the watermark update their window;
    later ones are dropped and the window state is reclaimed — the
    standard bounded-state shape for a continuously-ingesting events
    stream."""
    from pyspark.sql import functions as F

    return (events_stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
            .agg(F.count("*").alias("n")))


def streaming_exact_dedup(docs_stream, ts_col: str = "ingest_ts",
                          watermark: str = "10 minutes",
                          text_col: str = "text"):
    """Streaming exact dedup for a continuously-ingesting document
    stream (the training-data-pipeline stream op): keep the first
    arrival of each content hash, drop replays.

    State is BOUNDED by the watermark — dropDuplicatesWithinWatermark
    keeps one state row per distinct hash only until the watermark
    passes its event time, so a forever-running crawl ingest can't
    accumulate unbounded dedup state (a plain dropDuplicates would).
    Duplicates separated by more than the watermark horizon are NOT
    caught here by design; cross-horizon dedup belongs to the batch
    `ops.dedup.exact_dedup` compaction pass."""
    from pyspark.sql import functions as F

    hashed = docs_stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return (hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


_PAIR_OUT_SCHEMA = ("url string, job_id long, cf string, "
                    "start_seq long, finish_seq long, duration_ms long")
_PAIR_STATE_SCHEMA = "start_seq long, start_micros long"


def stateful_flow_pairs_stream(flow_events):
    """Custom stateful streaming operator (applyInPandasWithState):
    start/finish flow pairing with state carried ACROSS micro-batches.

    Keyed by (url, job_id, cf); the state is the most recent seen start
    — the batch flow_pairs matching rule (a finish binds to the most
    recent start of its job/cf).  APPEND-MODE DIVERGENCE: batch
    flow_pairs keeps only the LAST finish per start (max_by finish_seq),
    but a streaming pair row, once emitted, cannot be retracted — a
    multi-finish job therefore yields one row per finish here.
    Downstream consumers wanting batch-identical output should keep
    max finish_seq per (url, job_id, cf, start_seq).  Each finish emits
    one pair row incrementally; finishes arriving before any start emit
    nothing, starts waiting for a finish live in state.

    Input rows: (url, job_id, cf, seq, event_type, time_micros) where
    event_type is 'start' or 'finish'.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd
        url, job_id, cf = key
        if state.exists:
            start_seq, start_micros = state.get
        else:
            start_seq, start_micros = None, None

        out = {"url": [], "job_id": [], "cf": [], "start_seq": [],
               "finish_seq": [], "duration_ms": []}
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: r["seq"])
        for r in rows:
            if r["event_type"] == "start":
                start_seq, start_micros = r["seq"], r["time_micros"]
            elif start_seq is not None:
                out["url"].append(url)
                out["job_id"].append(job_id)
                out["cf"].append(cf)
                out["start_seq"].append(start_seq)
                out["finish_seq"].append(r["seq"])
                out["duration_ms"].append(
                    int((r["time_micros"] - start_micros) / 1000))
        if start_seq is not None:
            state.update((start_seq, start_micros))
        yield pd.DataFrame(out)

    return (flow_events
            .groupBy("url", "job_id", "cf")
            .applyInPandasWithState(
                fn, outputStructType=_PAIR_OUT_SCHEMA,
                stateStructType=_PAIR_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


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
