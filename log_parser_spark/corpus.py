"""Deterministic synthetic pages corpus (FIXTURES.md §1-2).

Embeds the reference's own test logs (used as *data*, the correctness
oracle corpus) into a Common-Crawl-style pages table
(url, warc_ts, html, text, lang) with Zipf-like domain skew.  Fully
deterministic for a given (n_pages, seed).
"""

from __future__ import annotations

import datetime
import glob
import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from log_parser_spark.engine.schema import PAGES_SCHEMA

# Fixture logs are vendored into the package (data/) so the pipeline has
# no runtime dependency on the read-only reference checkout; tests still
# read /root/reference directly for differential comparison.
_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
REFERENCE_INPUTS = os.path.join(_DATA_DIR, "input_files")
BASELINE_LOGS = os.path.join(_DATA_DIR, "baseline_logs")

# Header prepended to the stats-only fixture so it carries valid metadata
# (the raw fixture starts mid-log and is rejected by full-file parsing,
# in both the reference CLI and our engine).
_STATS_HEADER = (
    "2022/11/24-15:58:00.000000 32851 RocksDB version: 7.2.2\n"
    "2022/11/24-15:58:00.000001 32851 Git sha 0000000\n"
    "2022/11/24-15:58:00.000002 32851 DB Session ID:  STATSSAMPLE000000000\n"
)

# Zipf-ish domain weights: one hot domain dominating (north-rule skew).
_DOMAINS = [("hot.example.com", 64, "en"), ("warm.example.org", 16, "de"),
            ("mid.example.net", 8, "ja"), ("cool.example.io", 4, "fr"),
            ("cold.example.dev", 2, "es"), ("tiny.example.ai", 1, "en")]


def load_corpus_logs() -> dict[str, str]:
    """corpus_log_id -> verbatim log text (FIXTURES.md §2)."""
    logs: dict[str, str] = {}
    with open(os.path.join(REFERENCE_INPUTS, "LOG_sample")) as f:
        logs["sample"] = f.read()
    with open(os.path.join(REFERENCE_INPUTS, "LOG_sample_stats.txt")) as f:
        logs["sample_stats"] = _STATS_HEADER + f.read()
    with open(os.path.join(REFERENCE_INPUTS, "Rolled_LOG_sample.txt")) as f:
        logs["rolled"] = f.read()
    with open(os.path.join(REFERENCE_INPUTS, "LOG_sample-bad.txt")) as f:
        logs["bad"] = f.read()
    for path in sorted(glob.glob(os.path.join(BASELINE_LOGS, "LOG-*"))):
        with open(path) as f:
            logs[os.path.basename(path)] = f.read()
    return logs


def corpus_rows(n_pages: int, seed: int = 42):
    """Deterministic generator of page tuples."""
    logs = load_corpus_logs()
    log_ids = sorted(logs.keys())
    total_w = sum(w for _, w, _ in _DOMAINS)
    base_ts = datetime.datetime(2023, 1, 1, tzinfo=datetime.timezone.utc)

    rows = []
    for i in range(n_pages):
        h = int.from_bytes(
            hashlib.sha1(f"{seed}:{i}".encode()).digest()[:8], "big")
        # weighted domain pick (hot domain gets most replicas)
        pick = h % total_w
        for domain, w, lang in _DOMAINS:
            if pick < w:
                break
            pick -= w
        log_id = log_ids[(h >> 8) % len(log_ids)]
        text = logs[log_id]
        url = f"https://{domain}/{log_id}/{i:08d}"
        warc_ts = base_ts + datetime.timedelta(seconds=(h % 86_400))
        html = b"<html><pre>" + text[:64].encode() + b"</pre></html>"
        rows.append((url, warc_ts, html, text, lang))
    return rows


def build_pages_df(spark: SparkSession, n_pages: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Small corpora are built driver-side; large ones are generated in
    executors (spark.range -> mapInPandas) so generation itself scales."""
    if n_pages <= 2000:
        rows = corpus_rows(n_pages, seed)
        df = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    else:
        df = _build_pages_distributed(spark, n_pages, seed)
    if partitions:
        df = df.repartition(partitions)
    return df


def _build_pages_distributed(spark: SparkSession, n_pages: int,
                             seed: int) -> DataFrame:
    import pandas as pd

    logs = load_corpus_logs()
    log_ids = sorted(logs.keys())
    total_w = sum(w for _, w, _ in _DOMAINS)
    base_ts = datetime.datetime(2023, 1, 1, tzinfo=datetime.timezone.utc)

    def gen(batches):
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [], "text": [],
                   "lang": []}
            for i in pdf["id"].values:
                i = int(i)
                h = int.from_bytes(
                    hashlib.sha1(f"{seed}:{i}".encode()).digest()[:8], "big")
                pick = h % total_w
                for domain, w, lang in _DOMAINS:
                    if pick < w:
                        break
                    pick -= w
                log_id = log_ids[(h >> 8) % len(log_ids)]
                text = logs[log_id]
                out["url"].append(f"https://{domain}/{log_id}/{i:08d}")
                out["warc_ts"].append(
                    base_ts + datetime.timedelta(seconds=(h % 86_400)))
                out["html"].append(
                    b"<html><pre>" + text[:64].encode() + b"</pre></html>")
                out["text"].append(text)
                out["lang"].append(lang)
            yield pd.DataFrame(out)

    # small files/row-groups => fine-grained splits for the
    # worker-side parquet reader (parse_pages_parquet)
    n_part = max(8, min(512, n_pages // 250))
    return spark.range(0, n_pages, 1, n_part).mapInPandas(
        gen, schema=PAGES_SCHEMA)


def write_pages_parquet(spark: SparkSession, path: str, n_pages: int,
                        seed: int = 42, partitions: int | None = None) -> str:
    build_pages_df(spark, n_pages, seed, partitions).write.mode(
        "overwrite").parquet(path)
    return path
