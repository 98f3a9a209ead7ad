"""End-to-end pipeline: pages -> parse -> records table -> route -> sinks
(+ per-split lineage, exact resume).

Checkpoint/resume model (north rule): the unit of work is an *input
split* (parquet file + row group).  Splits are grouped into buckets;
each bucket run writes
  - out/records/bucket=N/   (the parsed, typed records table — the
    checkpoint boundary; plain parquet, column-pruned by every branch)
  - out/<sink>/bucket=N/    for every routed sink
  - out/_lineage/bucket-N-epoch-E.json  (splits, rows in/out, wall ms)
A restart with resume=True anti-joins pending buckets against the
lineage table and re-processes only missing ones — exact resume without
Structured Streaming (the input is bounded; SURVEY §2.8).

Measured on 24k docs / local[32]: records-as-parquet beats records-as-
cache (31.6s vs 65.7s end-to-end) because every sink branch re-scan is
column-pruned at the parquet scan instead of deserializing full cached
rows.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_parser_spark.engine import branches, sinks
from log_parser_spark.engine.parse import (parquet_splits, parse_pages,
                                           parse_splits)

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
    "parsed_json": lambda r: _parsed_json(r),
    "parsed_json_report": lambda r: _parsed_json_report(r),
    "quarantine": lambda r: branches.quarantine(r),
}


def _parsed_json(records):
    from log_parser_spark.engine.summary import parsed_json_sink
    return parsed_json_sink(records)


def _parsed_json_report(records):
    """S9 exact: reference get_json shape per url (summary module)."""
    from log_parser_spark.engine.summary import parsed_json_report
    return parsed_json_report(records)


def _parquet_row_count(path: str) -> int:
    import glob

    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(path, "*.parquet")))


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def processed_buckets(spark: SparkSession, out_dir: str,
                      n_buckets: int | None = None,
                      current_splits: dict[int, list[str]] | None = None
                      ) -> set[int]:
    """Buckets whose lineage says they're done.

    A bucket only counts as done if its recorded n_buckets matches the
    current run AND (when the current split assignment is provided) the
    recorded split-id set equals the bucket's current membership —
    re-running with a different n_buckets or after new input files land
    would otherwise silently skip or double-process documents."""
    path = _lineage_path(out_dir)
    try:
        rows = spark.read.json(path).select(
            "bucket", "n_buckets", "splits").collect()
    except Exception:
        return set()
    done = set()
    for r in rows:
        if n_buckets is not None and r["n_buckets"] != n_buckets:
            continue
        if current_splits is not None:
            want = current_splits.get(r["bucket"])
            if want is None or sorted(r["splits"] or []) != sorted(want):
                continue
        done.add(r["bucket"])
    return done


def records_table_name(out_dir: str, bucket: int) -> str:
    """Deterministic metastore name for a bucketed records table."""
    import hashlib
    h = hashlib.md5(os.path.abspath(out_dir).encode()).hexdigest()[:12]
    return f"recs_{h}_b{bucket}"


def register_records_table(spark: SparkSession, out_dir: str,
                           bucket: int) -> str:
    """Re-register a bucketed records table in THIS session's
    metastore from the on-disk layout — the fresh-session recovery
    path.  ``saveAsTable`` registrations live in the writing session's
    metastore only, so a resume or a downstream consumer running in a
    NEW session (different warehouse/derby) cannot ``spark.table()``
    the records until this runs.  The bucket spec is read from the
    ``_bucket_spec.json`` marker written next to the parquet files
    (underscore-prefixed, so readers ignore it), and the re-created
    external table keeps full bucket semantics: Spark derives each
    file's bucket id from its ``_000NN`` filename suffix, so the
    Exchange-free join/window plans survive re-registration (pinned by
    tests/test_pipeline.py::test_bucketed_records_fresh_session).
    Idempotent: an already-registered table is returned as-is."""
    table = records_table_name(out_dir, bucket)
    if spark.catalog.tableExists(table):
        return table
    rec_path = os.path.join(out_dir, "records", f"bucket={bucket}")
    spec_path = os.path.join(rec_path, "_bucket_spec.json")
    if not os.path.exists(spec_path):
        raise FileNotFoundError(
            f"{spec_path}: records bucket {bucket} has no bucket-spec "
            f"marker — it was written without bucket_records (plain "
            f"parquet layout) or by a pre-bucketing version; resume it "
            f"without bucket_records, or re-run the bucket with "
            f"bucket_records set to rewrite the bucketed layout")
    with open(spec_path) as f:
        spec = json.load(f)
    schema = spark.read.parquet(rec_path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in schema.fields)
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"CLUSTERED BY ({spec['bucket_col']}) "
        f"SORTED BY ({spec['bucket_col']}) "
        f"INTO {spec['n_file_buckets']} BUCKETS "
        f"LOCATION '{rec_path}'")
    return table


def run_pipeline(spark: SparkSession, out_dir: str,
                 pages: DataFrame | None = None,
                 pages_path: str | None = None,
                 n_buckets: int = 1, epoch: int = 0,
                 sink_names: list[str] | None = None,
                 resume: bool = False,
                 only_buckets: list[int] | None = None,
                 bucket_records: int | None = None) -> dict:
    """Runs parse->route->write for every pending bucket.

    pages_path (preferred at scale): parquet dir read worker-side, with
    row-group-level splits as the lineage unit.
    pages: any DataFrame source (tests); bucketing by url hash.
    only_buckets: restrict this worker/executor to a bucket subset
    (disjoint shards for multi-process scale-out).
    bucket_records: opt-in co-located layout — write each records
    table ``bucketBy(N, url).sortBy(url)`` (external table at the same
    records path, registered as ``records_table_name(out_dir, b)``).
    Every sink-branch join/window/aggregation key starts with url, so
    reading the bucketed table makes them Exchange-free: windows and
    aggregations accept subset-of-keys hash partitioning outright, and
    equi-joins do under
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` (pinned by
    tests/test_plans.py::test_production_records_bucketed_join_without_
    exchange).  At 100 TB this converts every per-document sink shuffle
    into a map-side pass over pre-clustered buckets.
    """
    assert (pages is None) != (pages_path is None), \
        "exactly one of pages / pages_path"
    os.makedirs(out_dir, exist_ok=True)
    sink_names = sink_names or list(SINK_BUILDERS)

    all_splits = parquet_splits(pages_path) if pages_path else None
    if all_splits is not None:
        split_map = {b: [f"{os.path.basename(p)}#{rg}"
                         for p, rg, _ in all_splits[b::n_buckets]]
                     for b in range(n_buckets)}
    else:
        split_map = {b: [f"hashbucket-{b}"] for b in range(n_buckets)}

    done = processed_buckets(spark, out_dir, n_buckets, split_map) \
        if resume else set()
    pending = [b for b in range(n_buckets) if b not in done
               and (only_buckets is None or b in only_buckets)]

    # resume in a FRESH session: already-done buckets are skipped
    # below, but their bucketed-table registrations lived in the
    # ORIGINAL session's metastore — rebuild them here so consumers
    # can spark.table() every bucket after any resume
    if bucket_records:
        for b in done:
            register_records_table(spark, out_dir, b)

    metrics = {"epoch": epoch, "buckets": [], "rows_out": {}}

    for bucket in pending:
        t0 = time.time()
        if all_splits is not None:
            splits = all_splits[bucket::n_buckets]
            if not splits:
                continue
            records_src = parse_splits(spark, splits)
            rows_in = sum(s[2] for s in splits)
            rows_in_method = "split_footers"  # exact (parquet metadata)
            split_ids = split_map[bucket]
        else:
            bucket_col = F.pmod(F.xxhash64("url"), F.lit(n_buckets))
            part = pages.filter(bucket_col == bucket)
            # input count rides the parse job via an accumulator —
            # no separate count() scan per bucket
            rows_acc = spark.sparkContext.accumulator(0)
            records_src = parse_pages(part, rows_in_acc=rows_acc)
            rows_in = None
            # accumulator updates inside a transformation re-apply on
            # task retries/speculation, so this count can over-report;
            # the lineage row records the method so an audit never
            # mistakes it for the exact split_footers count
            rows_in_method = "accumulator"
            split_ids = [f"hashbucket-{bucket}"]

        rec_path = os.path.join(out_dir, "records", f"bucket={bucket}")
        if bucket_records:
            table = records_table_name(out_dir, bucket)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            (records_src.write.mode("overwrite")
             .bucketBy(bucket_records, "url").sortBy("url")
             .option("path", rec_path).saveAsTable(table))
            # bucket-spec marker: lets register_records_table rebuild
            # the metastore entry in a FRESH session (resume/consumer)
            with open(os.path.join(rec_path, "_bucket_spec.json"),
                      "w") as f:
                json.dump({"n_file_buckets": bucket_records,
                           "bucket_col": "url", "sort_col": "url"}, f)
            records = spark.table(table)
        else:
            records_src.write.mode("overwrite").parquet(rec_path)
            records = spark.read.parquet(rec_path)
        if rows_in is None:
            rows_in = rows_acc.value

        # sinks are independent writes over small routed subsets: submit
        # them concurrently so their fixed job latencies overlap (the
        # scheduler interleaves; this is the non-scaling part of the
        # wall otherwise)
        def write_sink(name):
            df = SINK_BUILDERS[name](records)
            path = os.path.join(out_dir, name, f"bucket={bucket}")
            df.write.mode("overwrite").parquet(path)
            return name, path

        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(sink_names))) as ex:
            paths = dict(ex.map(lambda n: write_sink(n), sink_names))

        # row counts from parquet footers — no extra Spark jobs
        rows_out = {"records": _parquet_row_count(rec_path)}
        for name, path in paths.items():
            rows_out[name] = _parquet_row_count(path)

        lineage_row = {
            "bucket": bucket, "epoch": epoch, "n_buckets": n_buckets,
            "rows_in": rows_in, "rows_in_method": rows_in_method,
            "splits": split_ids, "rows_out": rows_out,
            "wall_ms": int((time.time() - t0) * 1000),
        }
        lpath = _lineage_path(out_dir)
        os.makedirs(lpath, exist_ok=True)
        with open(os.path.join(
                lpath, f"bucket-{bucket}-epoch-{epoch}.json"), "w") as f:
            f.write(json.dumps(lineage_row) + "\n")

        metrics["buckets"].append(lineage_row)
        for k, v in lineage_row["rows_out"].items():
            metrics["rows_out"][k] = metrics["rows_out"].get(k, 0) + v

    return metrics
