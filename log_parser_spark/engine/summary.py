"""S9: the parsed_json summary sink — one nested summary row per url
(the reference's json_outputter.get_json shape, json_outputter.py:231-269),
assembled relationally from the aggregate layer and emitted both as
typed struct columns and as a ready-to-ship JSON string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_parser_spark.engine import aggregates as A
from log_parser_spark.engine import branches, sinks


def _percf(df: DataFrame, struct_cols: list[str], name: str) -> DataFrame:
    """Collapse a per-(url, cf) aggregate into one array<struct> per url."""
    return df.groupBy("url").agg(
        F.sort_array(F.collect_list(F.struct(*struct_cols))).alias(name))


def parsed_json_sink(records: DataFrame,
                     spark: SparkSession | None = None) -> DataFrame:
    """Per-url summary: General / DB-Size / Flushes / Compactions /
    Reads / Warnings sections (json_outputter.py:231-254 structure)."""
    meta = branches.metadata(records)
    counters = branches.counters(records)
    events = branches.events(records)
    prefinish = branches.prefinish(records)
    comp_stats = branches.comp_stats(records)
    stalls = branches.db_stats_stalls(records)
    warnings = sinks.warnings_sink(branches.warnings(records),
                                   branches.cf_registry(records))
    read_lat = branches.read_latency(records)

    out = meta.select(
        "url", "product_name", "version", "git_hash", "db_session_id",
        "start_time", "end_time")

    out = out.join(A.db_size_start_end(comp_stats), "url", "left")
    out = out.join(A.user_opers_stats(counters), "url", "left")
    out = out.join(A.delete_opers_stats(events), "url", "left")
    out = out.join(A.largest_compaction_input(events), "url", "left")
    out = out.join(A.stall_totals(stalls), "url", "left")

    out = out.join(_percf(
        A.flush_stats(events),
        ["cf", "flush_reason", "n_flushes", "total_data_size",
         "min_duration_ms", "max_duration_ms"], "flushes"), "url", "left")
    out = out.join(_percf(
        A.compaction_stats_per_cf(events, prefinish),
        ["cf", "n_compactions", "min_write_rate_mbps", "max_write_rate_mbps",
         "max_duration_ms"], "compactions"), "url", "left")
    out = out.join(_percf(
        A.read_latency_per_cf(read_lat),
        ["cf", "num_reads", "avg_read_latency_us", "max_read_latency_us",
         "percent_of_all_reads"], "reads"), "url", "left")
    out = out.join(_percf(
        A.filter_stats(events),
        ["cf", "filter_policy", "avg_bpk"], "filters"), "url", "left")
    out = out.join(_percf(
        A.compression_stats(events).withColumnRenamed("compression", "cf"),
        ["cf", "n_files", "total_compressed_size"], "compressions"),
        "url", "left")
    out = out.join(
        warnings.groupBy("url", "warn_type").agg(
            F.count("*").alias("n")).groupBy("url").agg(
            F.map_from_entries(F.sort_array(F.collect_list(
                F.struct("warn_type", "n")))).alias("warning_counts")),
        "url", "left")

    return out.withColumn(
        "summary_json",
        F.to_json(F.struct(*[c for c in out.columns if c != "url"])))


def parsed_json_report(records: DataFrame) -> DataFrame:
    """S9 exact: the reference-shaped get_json report per url
    (json_outputter.py:231-254), byte-comparable modulo the baseline log
    path.

    Spark shape: assembling one report needs ALL of a url's records, so
    this is document-level work — groupBy(url).applyInPandas with the
    pure-Python renderer (engine/json_render.py) inside.  Scales like
    the parser itself: per-url tasks, one shuffle on url, no driver-side
    loops.  The vendored baseline-options dim (a few thousand rows) is
    captured in the closure instead of re-parsing baseline logs per
    task."""
    import json as _json

    import pyarrow.parquet as _pq

    from log_parser_spark.engine import options_diff as od
    from log_parser_spark.engine.json_render import (
        baseline_from_options_rows, render_console_short,
        render_parsed_json)

    from log_parser_spark.queries import BASELINE_OPTS_PATH
    btab = _pq.read_table(BASELINE_OPTS_PATH).to_pylist()
    baseline_rows = [(r["product"], r["bversion"], r["section"], r["cf"],
                      r["option"], r["bvalue"]) for r in btab]
    baseline_dir = od.BASELINE_LOGS_DIR

    src = records.withColumn("attrs_json", F.to_json("attrs")).drop("attrs")

    def render(pdf):
        import pandas as pd
        pdf = pdf.sort_values("seq")
        recs = []
        for row in pdf.itertuples(index=False):
            r = row._asdict()
            r["attrs"] = _json.loads(r["attrs_json"]) \
                if r["attrs_json"] else None
            recs.append(r)
        url = recs[0]["url"]
        meta = {}
        for r in recs:
            if r["kind"] == "metadata":
                meta.setdefault(r["name"], r["msg"])
        baseline = baseline_from_options_rows(
            baseline_rows, meta.get("product_name"), meta.get("version"),
            baseline_dir)
        j = render_parsed_json(url, recs, baseline=baseline)
        console = render_console_short(url, recs)
        return pd.DataFrame({"url": [url],
                             "summary_json": [_json.dumps(j)],
                             "console_short": [console]})

    return src.groupBy("url").applyInPandas(
        render,
        schema="url string, summary_json string, console_short string")
