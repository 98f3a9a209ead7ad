"""End-to-end pipeline: pages -> parse -> route -> sinks (+ lineage).

Checkpoint/resume model (north rule): the input is processed in
url-hash *buckets*; each epoch writes every sink partitioned by bucket
and appends one lineage row per bucket (bucket id, epoch, rows in/out
per sink, wall ms).  A restart anti-joins pending buckets against the
lineage table and processes only the remainder — exact resume without
Structured Streaming (the input is bounded; SURVEY §2.8).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_parser_spark.engine import branches, sinks
from log_parser_spark.engine.parse import parse_pages

SINK_BUILDERS = {
    "counters_csv": lambda r: sinks.counters_sink(branches.counters(r)),
    "histograms_csv": lambda r: sinks.histograms_sink(branches.histograms(r)),
    "compaction_stats": lambda r: sinks.compaction_stats_sink(
        branches.comp_stats(r)),
    "flush_events": lambda r: sinks.flushes_sink(
        branches.events(r), branches.cf_registry(r)),
    "compactions": lambda r: sinks.compactions_sink(
        branches.events(r), branches.prefinish(r)),
    "files": lambda r: sinks.files_sink(branches.events(r)),
    "warnings": lambda r: sinks.warnings_sink(
        branches.warnings(r), branches.cf_registry(r)),
    "parsed_meta": lambda r: branches.metadata(r),
    "quarantine": lambda r: branches.quarantine(r),
}


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def processed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    path = _lineage_path(out_dir)
    try:
        rows = spark.read.json(path).select("bucket").distinct().collect()
        return {r["bucket"] for r in rows}
    except Exception:
        return set()


def run_pipeline(spark: SparkSession, pages: DataFrame, out_dir: str,
                 n_buckets: int = 1, epoch: int = 0,
                 sink_names: list[str] | None = None,
                 resume: bool = False) -> dict:
    """Runs parse->route->write for every pending bucket; returns metrics."""
    os.makedirs(out_dir, exist_ok=True)
    sink_names = sink_names or list(SINK_BUILDERS)

    done = processed_buckets(spark, out_dir) if resume else set()
    pending = [b for b in range(n_buckets) if b not in done]

    bucket_col = F.pmod(F.xxhash64("url"), F.lit(n_buckets))
    metrics = {"epoch": epoch, "buckets": [], "rows_out": {}}

    for bucket in pending:
        t0 = time.time()
        part = pages.filter(bucket_col == bucket)
        records = parse_pages(part)
        records.persist()
        try:
            rows_in = part.count()
            rows_out = {}
            for name in sink_names:
                df = SINK_BUILDERS[name](records)
                path = os.path.join(out_dir, name, f"bucket={bucket}")
                df.write.mode("overwrite").parquet(path)
                rows_out[name] = spark.read.parquet(path).count()
        finally:
            records.unpersist()

        lineage_row = {
            "bucket": bucket, "epoch": epoch, "rows_in": rows_in,
            "rows_out": rows_out, "wall_ms": int((time.time() - t0) * 1000),
        }
        # transactional-enough for local fs: one json file per bucket+epoch
        lpath = _lineage_path(out_dir)
        os.makedirs(lpath, exist_ok=True)
        with open(os.path.join(
                lpath, f"bucket-{bucket}-epoch-{epoch}.json"), "w") as f:
            f.write(json.dumps(lineage_row) + "\n")

        metrics["buckets"].append(lineage_row)
        for k, v in lineage_row["rows_out"].items():
            metrics["rows_out"][k] = metrics["rows_out"].get(k, 0) + v

    return metrics
