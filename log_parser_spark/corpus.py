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
# read /root/reference directly for differential comparison.  Resolved
# through datafiles so a --py-files zip deployment works too.
from log_parser_spark.datafiles import data_path  # noqa: E402

REFERENCE_INPUTS = data_path("input_files")
BASELINE_LOGS = data_path("baseline_logs")

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


_COMP_HEADER = (
    "Level    Files   Size     Score Read(GB)  Rn(GB) Rnp1(GB) Write(GB) "
    "Wnew(GB) Moved(GB) W-Amp Rd(MB/s) Wr(MB/s) Comp(sec) "
    "CompMergeCPU(sec) Comp(cnt) Avg(sec) KeyIn KeyDrop Rblob(GB) "
    "Wblob(GB)")
_COMP_SEP = "-" * 192
_COMP_ROW = ("{lvl:>4} {files:>7} {size:>10}   {score:.1f}      0.0     "
             "0.0      0.0       0.0      0.0       0.0   {wamp}      "
             "0.0      0.0      {comp_sec}              0.00         1"
             "    0.100       0      0       0.0       0.0")


def _tp_json(cf, cf_id, file_number, micros, file_size, data, index, filt,
             raw_k, raw_v, entries, filt_entries, policy, compression):
    """A table_file_creation EVENT_LOG_v1 payload with the full
    real-log property set (values synthetic)."""
    return (
        f'{{"time_micros": {micros}, "cf_name": "{cf}", "job": 1, '
        f'"event": "table_file_creation", "file_number": {file_number}, '
        f'"file_size": {file_size}, "file_checksum": "", '
        f'"file_checksum_func_name": "Unknown", "table_properties": '
        f'{{"data_size": {data}, "index_size": {index}, '
        f'"index_partitions": 0, "top_level_index_size": 0, '
        f'"index_key_is_user_key": 1, "index_value_is_delta_encoded": 1, '
        f'"filter_size": {filt}, "raw_key_size": {raw_k}, '
        f'"raw_average_key_size": 24, "raw_value_size": {raw_v}, '
        f'"raw_average_value_size": 64, "num_data_blocks": 100, '
        f'"num_entries": {entries}, "num_filter_entries": {filt_entries}, '
        f'"num_deletions": 0, "num_merge_operands": 0, '
        f'"num_range_deletions": 0, "format_version": 0, '
        f'"fixed_key_len": 0, "filter_policy": "{policy}", '
        f'"column_family_name": "{cf}", "column_family_id": {cf_id}, '
        f'"comparator": "leveldb.BytewiseComparator", '
        f'"merge_operator": "nullptr", "prefix_extractor_name": "nullptr", '
        f'"property_collectors": "[]", "compression": "{compression}", '
        f'"creation_time": 1675245600, "oldest_key_time": 0, '
        f'"file_creation_time": 1675245600, '
        f'"slow_compression_estimated_data_size": 0, '
        f'"fast_compression_estimated_data_size": 0, '
        f'"db_id": "synthetic", "db_session_id": "SYNTHSTATS0000000001"}}}}')


def synthetic_stats_log() -> str:
    """A deterministic, fully-synthetic LOG exercising the statistics
    surfaces the shipped fixtures leave empty: seek counters + seek
    latency histogram (A6), bloom filter counters (A18 FP rate), partial
    per-cf growth between stats dumps (A15 total-growth rules), and
    block-cache options + dump + counters (A22).  Parses cleanly under
    BOTH our engine and the reference (asserted by the parity tests).
    """
    D = "2023/02/01"
    tid = "7f0000000777"

    def t(sec, us=0):
        m, s = divmod(sec, 60)
        return f"{D}-10:{m:02d}:{s:02d}.{us:06d} {tid}"

    table_opts = (
        "            table_factory options:   flush_block_policy_factory: "
        "FlushBlockBySizePolicyFactory (0x7f0000000002)\n"
        "  cache_index_and_filter_blocks: {cif}\n"
        "  no_block_cache: 0\n"
        "  block_cache: 0x7f00000000aa\n"
        "  block_cache_name: LRUCache\n"
        "  block_cache_options:\n"
        "    capacity : 8388608\n"
        "    num_shard_bits : 4\n"
        "  block_cache_compressed: (nil)\n"
        "  filter_policy: {policy}\n"
        "  block_size: 4096")

    lines = [
        f"{t(0, 0)} RocksDB version: 7.7.3",
        f"{t(0, 1)} Git sha deadbeef0123456789",
        f"{t(0, 2)} DB Session ID:  SYNTHSTATS0000000001",
        f"{t(0, 10)}                         Options.error_if_exists: 0",
        f"{t(0, 11)}                       Options.create_if_missing: 1",
        f"{t(0, 12)}                              Options.statistics: "
        f"0x7f0000000001",
        # db-wide options end at the support-info block
        # (log_file.py find_support_info_start_index)
        f"{t(0, 20)} Compression algorithms supported:",
        f"{t(0, 21)} \tkZSTD supported: 1",
        f"{t(0, 22)} Fast CRC32 supported: Supported on x86",
        f"{t(0, 100)} [/column_family.cc:610] --------------- Options for "
        f"column family [default]:",
        f"{t(0, 101)}               Options.comparator: "
        f"leveldb.BytewiseComparator",
        f"{t(0, 102)}         Options.compaction_style: "
        f"kCompactionStyleLevel",
        f"{t(0, 103)}              Options.compression: Snappy",
        f"{t(0, 104)}            Options.table_factory: BlockBasedTable",
        f"{t(0, 105)} " + table_opts.format(cif=1, policy="bloomfilter"),
        f"{t(0, 106)}        Options.write_buffer_size: 67108864",
        f"{t(0, 110)} [/version_set.cc:4649] Column family [default] "
        f"(ID 0), log number is 0",
        f"{t(0, 200)} [/column_family.cc:610] --------------- Options for "
        f"column family [cfa]:",
        f"{t(0, 201)}               Options.comparator: "
        f"leveldb.BytewiseComparator",
        f"{t(0, 202)}              Options.compression: NoCompression",
        f"{t(0, 203)}            Options.table_factory: BlockBasedTable",
        f"{t(0, 204)} " + table_opts.format(cif=0, policy="nullptr"),
        f"{t(0, 205)}        Options.write_buffer_size: 67108864",
        f"{t(0, 210)} [/db_impl/db_impl.cc:2773] Created column family "
        f"[cfa] (ID 1)",
        # files: two bloom-filtered Snappy files for default (one later
        # deleted), one filter-less NoCompression file for cfa
        f"{t(5)} EVENT_LOG_v1 " + _tp_json(
            "default", 0, 10, 1675245605000000, 2_000_000, 1_800_000,
            50_000, 25_000, 1_200_000, 2_400_000, 50_000, 50_000,
            "bloomfilter", "Snappy"),
        f"{t(6)} EVENT_LOG_v1 " + _tp_json(
            "default", 0, 11, 1675245606000000, 3_000_000, 2_700_000,
            60_000, 30_000, 1_500_000, 3_000_000, 60_000, 60_000,
            "bloomfilter", "Snappy"),
        f"{t(7)} EVENT_LOG_v1 " + _tp_json(
            "cfa", 1, 12, 1675245607000000, 1_000_000, 900_000,
            20_000, 0, 500_000, 1_000_000, 20_000, 0,
            "", "NoCompression").replace('"job": 1', '"job": 3'),
        f'{t(8)} EVENT_LOG_v1 {{"time_micros": 1675245608000000, '
        f'"cf_name": "default", "job": 2, "event": "table_file_deletion", '
        f'"file_number": 10}}',
    ]

    def flush_started(sec, job, entries, size):
        return (f'{t(sec)} EVENT_LOG_v1 {{"time_micros": '
                f'{1675245600000000 + sec * 1000000}, "job": {job}, '
                f'"event": "flush_started", "num_memtables": 1, '
                f'"num_entries": {entries}, "num_deletes": 10, '
                f'"total_data_size": {size}, "memory_usage": {size}, '
                f'"flush_reason": "Write Buffer Full"}}')

    def flush_finished(sec, job):
        return (f'{t(sec)} EVENT_LOG_v1 {{"time_micros": '
                f'{1675245600000000 + sec * 1000000}, "job": {job}, '
                f'"event": "flush_finished", "output_compression": '
                f'"NoCompression", "lsm_state": [1, 0, 0, 0, 0, 0, 0], '
                f'"immutable_memtables": 0}}')

    def preamble(sec, cf, job, wal):
        return (f"{t(sec, 500)} [/flush_job.cc:335] [{cf}] [JOB {job}] "
                f"Flushing memtable with next log file: {wal}")

    # flush flows exercising the reference's incremental matching
    # (events.py:910-931): a finish binds to the most recent seen start
    # of its job, later finishes overwrite
    lines += [
        # job 7 (default): two starts then two finishes ->
        # (s1, None), (s2, f2)
        preamble(10, "default", 7, 5), flush_started(10, 7, 1000, 3_000_000),
        preamble(11, "default", 7, 6), flush_started(11, 7, 2000, 12_000_000),
        flush_finished(12, 7), flush_finished(13, 7),
        # job 8 (cfa): one start, two finishes -> (s3, f4)
        preamble(14, "cfa", 8, 7), flush_started(14, 8, 3000, 40_000_000),
        flush_finished(15, 8), flush_finished(16, 8),
        # job 9 (default): well-formed pair
        preamble(17, "default", 9, 8), flush_started(17, 9, 4000, 80_000_000),
        flush_finished(18, 9),
        # tie: two starts with the IDENTICAL timestamp in different cfs,
        # with the later-registered cf (cfa) appearing FIRST in document
        # order — the reference CSV breaks the tie by cf-registry order
        # (csv_outputter.get_flow_events_csv builds per-cf lists in
        # registry order, then stable-sorts on start time)
        preamble(19, "cfa", 11, 9), flush_started(19, 11, 500, 1_000_000),
        preamble(19, "default", 12, 10),
        flush_started(19, 12, 600, 1_500_000),
    ]

    # compaction flows: job 21 (default) with the textual pre-finish
    # stats line; job 22 (cfa) finished WITHOUT one (pre-finish left
    # join stays null)
    lines += [
        f"{t(20, 500)} [/db_impl/db_impl_compaction_flush.cc:3401] "
        f"[default] [JOB 21] Compacting 2@0 + 1@1 files to L1, score 1.50",
        f'{t(20, 600)} EVENT_LOG_v1 {{"time_micros": 1675245620000600, '
        f'"job": 21, "event": "compaction_started", '
        f'"compaction_reason": "LevelL0FilesNum", '
        f'"files_L0": [10, 11], "files_L1": [12], "score": 1.5, '
        f'"input_data_size": 5000000}}',
        f"{t(22)} (Original Log Time {D}-10:00:21.900000) "
        f"[/compaction/compaction_job.cc:812] [default] compacted to: "
        f"files[1 1 0 0 0 0 0] max score 0.50, MB/sec: 120.5 rd, 95.3 wr, "
        f"level 1, files in(2, 1) out(1 +0 blob) "
        f"MB in(4.0, 1.0 +0.0 blob) out(4.5 +0.0 blob), "
        f"read-write-amplify(2.4) write-amplify(1.1) OK, "
        f"records in: 110000, records dropped: 10000 "
        f"output_compression: Snappy",
        f'{t(22, 100)} EVENT_LOG_v1 {{"time_micros": 1675245622000100, '
        f'"job": 21, "event": "compaction_finished", '
        f'"compaction_time_micros": 2000000, '
        f'"compaction_time_cpu_micros": 1500000, "output_level": 1, '
        f'"num_output_files": 1, "total_output_size": 4500000, '
        f'"num_input_records": 110000, "num_output_records": 100000, '
        f'"num_subcompactions": 1, "output_compression": "Snappy", '
        f'"lsm_state": [1, 1, 0, 0, 0, 0, 0]}}',
        f"{t(23, 500)} [/db_impl/db_impl_compaction_flush.cc:3401] "
        f"[cfa] [JOB 22] Compacting 1@0 + 0@1 files to L1, score 1.10",
        f'{t(23, 600)} EVENT_LOG_v1 {{"time_micros": 1675245623000600, '
        f'"job": 22, "event": "compaction_started", '
        f'"compaction_reason": "ManualCompaction", '
        f'"files_L0": [13], "score": 1.1, "input_data_size": 800000}}',
        f'{t(24)} EVENT_LOG_v1 {{"time_micros": 1675245624000000, '
        f'"job": 22, "event": "compaction_finished", '
        f'"compaction_time_micros": 400000, '
        f'"compaction_time_cpu_micros": 300000, "output_level": 1, '
        f'"num_output_files": 1, "total_output_size": 700000, '
        f'"num_input_records": 20000, "num_output_records": 19000, '
        f'"num_subcompactions": 1, "output_compression": "NoCompression", '
        f'"lsm_state": [0, 1, 0, 0, 0, 0, 0]}}',
    ]

    def stats_dump(sec, cfs):
        body = [
            f"{t(sec)} [/db_impl/db_impl.cc:1007] ------- DUMPING STATS "
            f"-------",
            f"{t(sec, 100)} [/db_impl/db_impl.cc:1009] \n"
            "** DB Stats **\n"
            f"Uptime(secs): {sec}.0 total, {sec}.0 interval\n"
            f"Cumulative writes: 1000 writes, {sec * 100} keys, 100 commit "
            "groups, 10.0 writes per commit group, ingest: 0.10 GB, "
            "3.41 MB/s\n"
            "Cumulative WAL: 0 writes, 0 syncs, 0.00 writes per sync, "
            "written: 0.00 GB, 0.00 MB/s\n"
            "Cumulative stall: 00:00:0.000 H:M:S, 0.0 percent\n"
            "Interval writes: 0 writes, 0 keys, 0 commit groups, 0.0 "
            "writes per commit group, ingest: 0.00 MB, 0.00 MB/s\n"
            "Interval WAL: 0 writes, 0 syncs, 0.00 writes per sync, "
            "written: 0.00 GB, 0.00 MB/s\n"
            "Interval stall: 00:00:0.000 H:M:S, 0.0 percent\n"
            + "".join(
                f"\n** Compaction Stats [{cf}] **\n"
                f"{_COMP_HEADER}\n{_COMP_SEP}\n" + "\n".join(
                    _COMP_ROW.format(
                        lvl=lvl, files=files, size=size, score=0.5,
                        wamp=wamp, comp_sec="0.50")
                    for lvl, files, size, wamp in rows) + "\n"
                # per-cf no-file stats (P17): Uptime starts the section,
                # the Stalls(count) line carries the per-reason counts —
                # same shape as LOG_sample:118-125
                f"Uptime(secs): {sec}.0 total, {sec}.0 interval\n"
                f"Stalls(count): {ci + 1} level0_slowdown, "
                "0 level0_slowdown_with_compaction, "
                f"{sec // 100} level0_numfiles, "
                "0 level0_numfiles_with_compaction, "
                "0 stop for pending_compaction_bytes, "
                "0 slowdown for pending_compaction_bytes, "
                f"{2 * ci} memtable_compaction, 0 memtable_slowdown, "
                f"interval {ci + 1 + sec // 100 + 2 * ci} total count\n"
                for ci, (cf, rows) in enumerate(cfs))
            + "\nBlock cache LRUCache@0x7f00000000aa#777 capacity: 8.00 MB "
            "collections: 1 last_copies: 0 last_secs: 1.3e-05 "
            "secs_since: 0\n"
            "Block cache entry stats(count,size,portion): "
            "Misc(1,0.00 KB,0%) DataBlock(4,16.00 KB,0.195313%)\n"
            "Block cache [default] DataBlock(12.00 KB) IndexBlock(6.00 KB)"
            "\n\n"
            "** File Read Latency Histogram By Level [default] **\n"
            "** Level 0 read latency histogram (micros):\n"
            f"Count: {sec * 10} Average: 50.0000  StdDev: 10.00\n"
            "Min: 1  Median: 45.0000  Max: 300\n"
            "Percentiles: P50: 45.00 P75: 60.00 P99: 200.00 P99.9: 290.00 "
            "P99.99: 300.00\n"
            "------------------------------------------------------\n"
            "[       0,       1 ]        2   2.000%   2.000% \n",
        ]
        return body

    def statistics_dump(sec, mult):
        counters = [
            ("rocksdb.block.cache.miss", 500), ("rocksdb.block.cache.hit",
                                                1500),
            ("rocksdb.block.cache.add", 400),
            ("rocksdb.block.cache.index.miss", 50),
            ("rocksdb.block.cache.index.hit", 100),
            ("rocksdb.block.cache.index.add", 40),
            ("rocksdb.block.cache.filter.miss", 30),
            ("rocksdb.block.cache.filter.hit", 60),
            ("rocksdb.block.cache.filter.add", 20),
            ("rocksdb.block.cache.data.miss", 420),
            ("rocksdb.block.cache.data.hit", 1340),
            ("rocksdb.block.cache.data.add", 340),
            ("rocksdb.bloom.filter.useful", 800),
            ("rocksdb.bloom.filter.full.positive", 200),
            ("rocksdb.bloom.filter.full.true.positive", 150),
            ("rocksdb.number.keys.written", 5000),
            ("rocksdb.number.keys.read", 2000),
            ("rocksdb.number.db.seek", 100),
            ("rocksdb.number.db.next", 300),
            ("rocksdb.number.db.prev", 50),
            ("rocksdb.number.db.seek.found", 80),
        ]
        lines = [f"{name} COUNT : {v * mult}" for name, v in counters]
        lines.append(
            f"rocksdb.db.get.micros P50 : 10.000000 P95 : 50.000000 "
            f"P99 : 90.000000 P100 : 120.000000 COUNT : {2000 * mult} "
            f"SUM : {30000 * mult}")
        lines.append(
            f"rocksdb.db.seek.micros P50 : 20.000000 P95 : 80.000000 "
            f"P99 : 150.000000 P100 : 200.000000 COUNT : {100 * mult} "
            f"SUM : {5000 * mult}")
        return [f"{t(sec)} [/db_impl/db_impl.cc:761] STATISTICS:\n "
                + "\n ".join(lines)]

    lines += stats_dump(30, [
        ("default", [("L0", "2/0", "2.00 MB", "1.0"),
                     ("L1", "4/0", "10.00 MB", "2.0"),
                     ("Sum", "6/0", "12.00 MB", "1.5"),
                     ("Int", "0/0", "0.00 KB", "0.0")]),
        ("cfa", [("L0", "1/0", "1.00 MB", "1.0"),
                 ("Sum", "1/0", "1.00 MB", "1.0"),
                 ("Int", "0/0", "0.00 KB", "0.0")]),
    ])
    lines += statistics_dump(35, 1)
    # second dump: cfa missing entirely (partial growth), default grows
    # and gains a level that was absent at start
    lines += stats_dump(90, [
        ("default", [("L0", "4/0", "4.00 MB", "1.5"),
                     ("L1", "4/0", "10.00 MB", "2.5"),
                     ("L2", "2/0", "6.00 MB", "3.0"),
                     ("Sum", "10/0", "20.00 MB", "2.0"),
                     ("Int", "0/0", "0.00 KB", "0.0")]),
    ])
    lines += statistics_dump(95, 6)
    lines.append(
        f"{t(98)} ** Memory Reporting **\n"
        "Arena Stats:\n"
        "Total: 26M\n"
        "ArenaWrappedDBIter: 0\n"
        "HashSpdb: 26M\n"
        "CF Stats:\n"
        "Total: 30M\n"
        "[default]: 20M\n"
        "[cfa]: 10M\n"
        "MiscUsage: 5M")
    lines.append(f"{t(100)} [/db_impl/db_impl.cc:500] Shutdown: "
                 f"canceling all background work")
    return "\n".join(lines) + "\n"


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
    logs["synthetic_stats"] = synthetic_stats_log()
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
