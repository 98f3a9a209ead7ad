"""Log-line grammar: the regex surface of the RocksDB/Speedb LOG format.

These pattern *strings* are ported verbatim as data from the reference
grammar (/root/reference/regexes.py:1-233) so that extraction is
byte-identical; all execution machinery around them is new, Spark-first
code.  Patterns are compiled once per module import (i.e. once per Python
worker), so the per-Arrow-batch parse loop pays no re-compilation cost.
"""

from __future__ import annotations

import re

# -- basic constructs (regexes.py:18-35) --
WS = r"\s*"
INT = r"[\d]+"
INT_C = r"([\d]+)"
FLOAT = r"[-+]?(?:\d+(?:[.,]\d*)?|[.,]\d+)(?:[eE][-+]?\d+)?"
FLOAT_C = fr"({FLOAT})"
NUM_UNIT = r"(K|M|G)"
BYTES_UNIT = r"(KB|MB|GB|TB)"
NUM_WITH_UNIT = fr"{FLOAT_C}\s*{NUM_UNIT}?\s*"
CF_NAME_OLD = r"\[(?P<cf>[\w\]]*)\]"
CF_NAME = r"\[(?P<cf>.*)\]"
CF_ID = fr"\(ID\s+(?P<cf_id>{INT})\)"
JOB_ID = r"\[JOB (?P<job_id>[\d+]+)\]"
POINTER_NC = r"0x[\dA-Fa-f]+"

# -- log entry parts (regexes.py:40-55) --
EMPTY_LINE = r"^\s*$"
TIMESTAMP = r"\d{4}/\d{2}/\d{2}-\d{2}:\d{2}:\d{2}\.\d{6}"
ORIG_TIME = fr"\(Original Log Time ({TIMESTAMP})\)"
CODE_POS = r"\[\/?.*?\.[\w:]+:\d+\]"
START_LINE_WITH_WARN_PARTS = (
    fr"({TIMESTAMP}) (\w+)\s*(?:{ORIG_TIME})?\s*"
    fr"\[(WARN|ERROR|FATAL)\]\s*({CODE_POS})?(.*)"
)
START_LINE_PARTS = fr"({TIMESTAMP}) (\w+)\s*(?:{ORIG_TIME})?\s*({CODE_POS})?(.*)"
CF_WITH_JOB_ID = fr"{CF_NAME_OLD}\s*{JOB_ID}"

# -- metadata (regexes.py:59-64) --
DB_SESSION_ID = r"DB Session ID:\s*([0-9A-Z]+)"
PRODUCT_AND_VERSION = r"(\S+) version: ([0-9.]+)"
GIT_HASH_LINE = r"Git sha \s*(\S+)"

# -- options (regexes.py:68-79) --
OPTION_LINE = r"\s*Options\.(\S+)\s*:\s*(.+)?"
DB_WIDE_WBM_PSEUDO_OPTION_LINE = r"\s*wbm\.(\S+)\s*:\s*(.+)"
CF_OPTIONS_START = r"--------------- Options for column family \[(.*)\]:.*"
TABLE_OPTIONS_START_LINE = r"^\s*table_factory options:\s*(\S+)\s*:(.*)"
TABLE_OPTIONS_CONTINUATION_LINE = r"^\s*(\S+)\s*:(.*)"

# -- events (regexes.py:84-101) --
FLUSH_EVENT_PREAMBLE = (
    fr"^{WS}{CF_NAME}{WS}{JOB_ID}{WS}Flushing memtable "
    fr"with next log file:{WS}(?P<wal_id>{INT})"
)
COMPACTION_EVENT_PREAMBLE = fr"^{WS}{CF_NAME}{WS}{JOB_ID}{WS}Compacting.*score"
EVENT = r"\s*EVENT_LOG_v1"
WRITE_DELAY_WARN_MSG = fr"{CF_NAME_OLD}{WS}Stalling writes"
WRITE_STOP_WARN_MSG = fr"{CF_NAME_OLD}{WS}Stopping writes"

# -- statistics (regexes.py:106-143, 161-176) --
DUMP_STATS_STR = r"------- DUMPING STATS -------"
DB_STATS = fr"^{WS}\*\* DB Stats \*\*{WS}$"
CF_STATS = fr"^{WS}CF Stats{WS}{CF_NAME}{WS}$"
COMPACTION_STATS = fr"^{WS}\*\* Compaction Stats{WS}{CF_NAME}{WS}\*\*{WS}$"
FILE_READ_LATENCY_STATS = (
    fr"^{WS}\*\* File Read Latency Histogram By Level{WS}{CF_NAME}{WS}\*\*{WS}$"
)
LEVEL_READ_LATENCY_LEVEL_LINE = fr"\*\* Level {INT_C} read latency histogram \(micros\):"
LEVEL_READ_LATENCY_STATS_LINE1 = (
    fr"Count:{WS}{INT_C}{WS}Average:{WS}{FLOAT_C}{WS}StdDev:{WS}{FLOAT_C}"
)
LEVEL_READ_LATENCY_STATS_LINE2 = (
    fr"Min:{WS}{INT_C}{WS}Median:{WS}{FLOAT_C}{WS}Max:{WS}{INT_C}"
)
STATS_COUNTERS_AND_HISTOGRAMS = r"^\s*STATISTICS:\s*$"
UPTIME_STATS_LINE = (
    fr"^{WS}Uptime\(secs\):{WS}(?P<total>{FLOAT}){WS}total,"
    fr"{WS}(?P<interval>{FLOAT}){WS}interval"
)
STATS_COUNTER = fr"^{WS}([\w\.]+){WS}COUNT{WS}:{WS} {INT_C}{WS}$"
STATS_HISTOGRAM = (
    fr"^{WS}(?P<name>[\w\.]+){WS}P50{WS}:{WS}(?P<P50>{FLOAT})"
    fr"{WS}P95{WS}:{WS}(?P<P95>{FLOAT}){WS}P99{WS}:{WS}(?P<P99>{FLOAT})"
    fr"{WS}P100{WS}:{WS}(?P<P100>{FLOAT})"
    fr"{WS}COUNT{WS}:{WS}(?P<count>{INT}){WS}SUM{WS}:{WS}(?P<sum>{INT})"
)

# -- block cache (regexes.py:148-160) --
CACHE_ID = r"(\S+)"
BLOCK_CACHE_STATS_START = fr"Block cache {CACHE_ID} capacity: {FLOAT_C} {BYTES_UNIT} "
BLOCK_CACHE_ENTRY_STATS = r"Block cache entry stats\(count,size,portion\): (.*)"
BLOCK_CACHE_CF_ENTRY_STATS = fr"Block cache {CF_NAME} (.*)"
BLOCK_CACHE_ENTRY_ROLES_NAMES = r"([A-Za-z]+)\("
BLOCK_CACHE_ENTRY_ROLES_STATS = r"[a-zA-Z]+\(([^\)]+?)\)"

BLOB_STATS_LINE = (
    fr"Blob file count: ([\d]+), total size: {FLOAT_C} GB, "
    fr"garbage size: {FLOAT_C} GB, space amp: {FLOAT_C}"
)
SUPPORT_INFO_START_LINE = r"\s*Compression algorithms supported:\s*$"

# -- db-wide stall / writes (regexes.py:181-195) --
DB_WIDE_INTERVAL_STALL = (
    fr"Interval stall: (\d+):(\d+):(\d+)\.(\d+) H:M:S, {FLOAT_C} percent"
)
DB_WIDE_CUMULATIVE_STALL = (
    fr"Cumulative stall: (\d+):(\d+):(\d+)\.(\d+) H:M:S, {FLOAT_C} percent"
)
DB_WIDE_CUMULATIVE_WRITES = (
    fr"Cumulative writes:\s*{NUM_WITH_UNIT} writes,\s*{NUM_WITH_UNIT} keys.*"
    fr"ingest: {FLOAT_C}\s*GB,\s*{FLOAT_C}\s*MB/s"
)
CF_STALLS_LINE_START = "Stalls(count):"
CF_STALLS_COUNT_AND_REASON = r"\b(\d+) (.*?),"
CF_STALLS_INTERVAL_COUNT = r".*interval (\d+) total count$"

# -- cf lifetime (regexes.py:198-204) --
RECOVERED_CF = (
    fr"Column family {CF_NAME}\s*{CF_ID},{WS}log number is (?P<log_num>{INT})"
)
CREATE_CF = fr"Created column family {CF_NAME}\s*{CF_ID}"
DROP_CF = fr"Dropped column family with id {INT_C}\s*"

# -- compaction monitor lines (regexes.py:211-233) --
COMPACTION_BEFORE_SCORE_LINE = (
    fr"{CF_NAME}\s*{JOB_ID}\s*Compacting .*files to L{INT_C},\s*score\s*{FLOAT_C}"
)
COMPACTION_JOB_FINISH_STATS_LINE = (
    fr"{CF_NAME_OLD}.*,\s*MB\/sec:\s*{FLOAT_C}\s*rd,"
    fr"\s*{FLOAT_C}\s*wr,.*read-write-amplify\({FLOAT_C}\)\s*write-amplify\("
    fr"{FLOAT_C}\).*records in:\s*{INT_C},\s*records dropped:\s*{INT_C}"
)

# -- memory reporting (regexes.py:113-120) --
MEM_REP_USAGE = r"(?P<usage>.*)"
MEM_REP_TITLE = fr"^{WS}\*\* Memory Reporting \*\*{WS}$"
MEM_REP_ARENA_STATS_TITLE = "Arena Stats:"
MEM_REP_CFS_STATS_TITLE = "CF Stats:"
MEM_REP_TOTAL_LINE = fr"Total: {MEM_REP_USAGE}"
MEM_REP_CF_USAGE_LINE = fr"{CF_NAME}: {MEM_REP_USAGE}$"
MEM_REP_ENTITY_USAGE_LINE = fr"(?P<entity>.*?): {MEM_REP_USAGE}$"


class _Compiled:
    """Lazily compiled pattern cache (one compile per worker process)."""

    def __init__(self):
        self._cache: dict[str, re.Pattern] = {}

    def __call__(self, pattern: str, flags: int = 0) -> re.Pattern:
        key = f"{flags}:{pattern}"
        pat = self._cache.get(key)
        if pat is None:
            pat = re.compile(pattern, flags)
            self._cache[key] = pat
        return pat


compiled = _Compiled()

# Constants mirroring the reference naming conventions (utils.py:33-74)
NO_CF = "DB_WIDE"
INVALID_CF = "UNKNOWN-CF"
DEFAULT_CF_NAME = "default"
NO_COMPRESSION = "NoCompression"
DB_WIDE_WRITE_BUFFER_MANAGER_OPTIONS_NAME = "write_buffer_manager"
