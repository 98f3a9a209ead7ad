"""Drop-in CLI with the reference tool's command shape
(log_parser.py:243-331): a user of the reference can switch by
replacing `python log_parser.py` with `python -m log_parser_spark` and
get the same files with the same names in the same run_dddd folders —
the CSV/JSON/console bytes are the byte-parity renderers the test
suite pins against the reference.

    python -m log_parser_spark <input> [-c {short,long}] [-j]
        [-o OUTPUT_FOLDER] [-l]

Beyond the reference, <input> may also be:
  - a DIRECTORY of LOG files, or
  - a pages parquet directory (url, warc_ts, html, text, lang)
in which case the parse fans out over Spark and each document gets its
own sub-folder under run_dddd — the distributed mode the single-file
reference lacks.  Flags and output layout are otherwise identical.

SCALE WARNING — this module is the SINGLE-LOG tool, not the corpus
path: to render per-document reports it collect()s every sink's rows
to the driver (reproducing the reference's one-file CLI contract).
Point it at a handful of logs, never a crawl.  The distributed corpus
path is engine.pipeline.run_pipeline (partitioned sinks + lineage) and
engine.summary.parsed_json_report (the same JSON report, one row per
url, fully distributed).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys
from pathlib import Path

OUTPUT_SUB_FOLDER_PREFIX = "run_"
DEFAULT_OUTPUT_FOLDER = "output_files"
DEFAULT_JSON_FILE_NAME = "log.json"
DEFAULT_LOG_FILE_NAME = "log_parser.log"
FILE_NOT_GENERATED_TEXT = "File Not Generated"


def setup_parser():
    p = argparse.ArgumentParser(
        prog="python -m log_parser_spark",
        description="Spark-native log parser (reference-compatible CLI)")
    p.add_argument("input", metavar="log-file-path",
                   help="a LOG file, a directory of LOG files, or a "
                        "pages parquet directory")
    p.add_argument("-c", "--console", choices=["short", "long"],
                   help="print a summary (short) or the full JSON "
                        "(long) to the console")
    p.add_argument("-j", "--generate-json", action="store_true",
                   default=False,
                   help=f"write {DEFAULT_JSON_FILE_NAME} into the "
                        f"output folder")
    p.add_argument("-o", "--output-folder", default=DEFAULT_OUTPUT_FOLDER,
                   help="parent folder; outputs go to sub-folders "
                        f"named {OUTPUT_SUB_FOLDER_PREFIX}dddd "
                        "(default: %(default)s)")
    p.add_argument("-l", "--generate-log", action="store_true",
                   default=False,
                   help=f"write {DEFAULT_LOG_FILE_NAME} with parser "
                        f"progress messages")
    p.add_argument("--cores", type=int, default=8,
                   help="local[N] cores for the Spark session "
                        "(default: %(default)s)")
    return p


def prepare_output_folder(parent: str) -> str:
    """Same run-numbering semantics as the reference
    (log_parser.py:167-189): next run_dddd under the parent, wrapping
    after 9999."""
    largest = 0
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            if name.startswith(OUTPUT_SUB_FOLDER_PREFIX):
                suffix = name[len(OUTPUT_SUB_FOLDER_PREFIX):]
                if suffix.isnumeric() and len(suffix) == 4:
                    largest = max(largest, int(suffix))
        if largest == 9999:
            largest = 1
    out = os.path.join(parent, f"{OUTPUT_SUB_FOLDER_PREFIX}{largest + 1:04}")
    os.makedirs(parent, exist_ok=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    return out


def _pages_df(spark, path: str):
    from log_parser_spark.engine.schema import PAGES_SCHEMA
    if os.path.isdir(path):
        if glob.glob(os.path.join(path, "*.parquet")):
            return spark.read.parquet(path), True
        files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                       if os.path.isfile(f))
        if not files:
            sys.exit(f"no input files under {path}")
        rows = [(os.path.abspath(f), None, None,
                 open(f, errors="replace").read(), None) for f in files]
        return spark.createDataFrame(rows, schema=PAGES_SCHEMA), True
    if not os.path.isfile(path):
        sys.exit(f"{path}: no such file")
    rows = [(os.path.abspath(path), None, None,
             open(path, errors="replace").read(), None)]
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA), False


def _safe_name(url: str) -> str:
    return re.sub(r"[^\w.-]+", "_", url.strip("/").split("/")[-1]) or "doc"


def _write_csvs(per_url_rows: dict, folder: str, report: bool,
                log) -> dict:
    """Render + write the reference's CSV set for one document; returns
    the CSV-s path map embedded into log.json (files.csv is written but
    not in the map — log_parser.py:266-276)."""
    from log_parser_spark.engine import csv_render as R

    def emit(render, rows, fname, msg_start, none_msg, console=True):
        try:
            content = render(rows) if rows else None
        except R.FilesHeaderMismatch:
            # the reference ASSERTS here (get_files_csv); we skip the
            # file and say so instead of dying
            log(f"Files CSV skipped: table-properties header mismatch "
                f"(the reference asserts on such logs)", report and console)
            return None
        if not content:
            log(none_msg, report and console)
            return None
        path = Path(folder) / fname
        path.write_text(content)
        log(f"{msg_start}{path}", report and console)
        return path

    d = per_url_rows
    paths = {
        "Counters": emit(R.render_counters_csv, d.get("counters"),
                         "counters.csv", "Counters CSV Is in ",
                         "No Counters to report"),
        "Histograms (Human-Readable)": emit(
            R.render_human_histograms_csv, d.get("histograms"),
            "histograms_human_readable.csv",
            "Human Readable Counters Histograms CSV Is in ",
            "No Counters Histograms to report"),
        "Histograms (Tools)": emit(
            R.render_tools_histograms_csv, d.get("histograms"),
            "histograms_tools.csv",
            "Tools Counters Histograms CSV Is in ",
            "No Counters Histograms to report", console=False),
        "Compactions-Stats": emit(
            R.render_compaction_stats_csv, d.get("comp_stats"),
            "compactions_stats.csv", "Compactions Stats CSV Is in ",
            "No Compaction Stats to report"),
        "Compactions": emit(
            R.render_compactions_csv, d.get("compactions"),
            "compactions.csv", "Compactions CSV Is in ",
            "No Compactions to report"),
        "Flushes": emit(R.render_flushes_csv, d.get("flushes"),
                        "flushes.csv", "Flushes CSV Is in ",
                        "No Flushes to report"),
    }
    emit(R.render_files_csv, d.get("files"), "files.csv",
         "Files CSV Is in ", "No Files to report")
    return {k: (str(v) if v is not None else FILE_NOT_GENERATED_TEXT)
            for k, v in paths.items()}


def main(argv=None):
    args = setup_parser().parse_args(argv)
    if not args.console and not args.generate_json:
        args.console = "short"  # reference default (log_parser.py:118-121)

    out_dir = prepare_output_folder(args.output_folder)

    log_lines: list[str] = []

    def log(msg, to_console):
        log_lines.append(msg)
        if to_console:
            print(msg)

    from log_parser_spark.engine import branches, sinks
    from log_parser_spark.engine.json_render import (render_console_short,
                                                     render_parsed_json)
    from log_parser_spark.engine.parse import parse_pages
    from log_parser_spark.engine.session import get_spark

    spark = get_spark(app_name="log-parser-cli", cores=args.cores,
                      shuffle_partitions=max(8, args.cores))
    pages, multi = _pages_df(spark, args.input)
    records = parse_pages(pages).persist()

    def collect_per_url(df):
        out: dict[str, list[dict]] = {}
        for row in df.collect():
            d = row.asDict(recursive=True)
            out.setdefault(d["url"], []).append(d)
        return out

    events = branches.events(records)
    cf_reg = branches.cf_registry(records)
    sink_rows = {
        "counters": collect_per_url(
            sinks.counters_sink(branches.counters(records))),
        "histograms": collect_per_url(
            sinks.histograms_sink(branches.histograms(records))),
        "comp_stats": collect_per_url(
            sinks.compaction_stats_sink(branches.comp_stats(records))),
        "flushes": collect_per_url(sinks.flushes_sink(events, cf_reg)),
        "compactions": collect_per_url(
            sinks.compactions_sink(events, branches.prefinish(records))),
        "files": collect_per_url(sinks.files_sink(events)),
    }
    # url -> baseline LOG path (reference prints it right after the
    # "Log file:" line, log_parser.py:309-314; same nearest-version
    # resolution as the options-diff J10 join)
    from log_parser_spark.engine.options_diff import closest_baseline
    baselines: dict[str, str | None] = {}
    for row in branches.metadata(records).select(
            "url", "product_name", "version").collect():
        product = (row["product_name"] or "").lower()
        hit = closest_baseline(product.upper(), row["version"]) \
            if product in ("rocksdb", "speedb") and row["version"] else None
        baselines[row["url"]] = hit[2] if hit else None

    recs_per_url: dict[str, list[dict]] = {}
    for row in records.orderBy("url", "seq").collect():
        d = row.asDict(recursive=True)
        recs_per_url.setdefault(d.pop("url"), []).append(d)
    records.unpersist()

    urls = sorted(recs_per_url)
    report = args.console != "long"  # long mode prints only the JSON
    for url in urls:
        folder = os.path.join(out_dir, _safe_name(url)) if multi else out_dir
        os.makedirs(folder, exist_ok=True)
        if report:
            print(f"Log file: {Path(url).as_uri() if url.startswith('/') else url}")
            # log_parser.py:309-314
            if baselines.get(url):
                print(f"Baseline Log: {Path(baselines[url]).as_uri()}")
            else:
                print("No Available Baseline Log")
        csvs = _write_csvs({k: v.get(url) for k, v in sink_rows.items()},
                           folder, report, log)

        j = None
        if args.generate_json or args.console == "long":
            j = render_parsed_json(url, recs_per_url[url])
            j["CSV-s"] = csvs
            if args.generate_json:
                jpath = Path(folder) / DEFAULT_JSON_FILE_NAME
                with jpath.open("w") as f:
                    json.dump(j, f)
                log(f"JSON Output is in {jpath.resolve().as_uri()}", report)

        if args.console == "short":
            print()
            print(render_console_short(url, recs_per_url[url]))
        elif args.console == "long":
            print()
            print(json.dumps(j, indent=1))

    if args.generate_log:
        with open(os.path.join(out_dir, DEFAULT_LOG_FILE_NAME), "w") as f:
            f.write("\n".join(log_lines) + "\n")
    return out_dir


if __name__ == "__main__":
    main()
