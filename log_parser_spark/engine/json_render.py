"""S9 report edge: the reference-shaped parsed-json summary for ONE
document, rendered from OUR parsed records.

The reference's flagship report is json_outputter.get_json
(json_outputter.py:231-254): a nested dict with General / Options /
DB-Size / Flushes / Compactions / Reads / Seeks / Warnings /
Block-Cache-Stats / Memory-Reporting sections, every value humanized by
display_utils.  Assembling it needs ALL of a document's records, so it
is document-level work, exactly like parsing: the Spark shape is
groupBy(url).applyInPandas with this pure-Python renderer inside (see
summary.parsed_json_report), which distributes per-url and never
shuffles more than one url's records to a task.

Semantics are cited per section from the reference:
  json_outputter.py:26-255, display_utils.py (display shapes),
  calc_utils.py (calculations), db_options.py (sanitize + diffs),
  db_files.py (files monitor), cache_utils.py (block cache),
  stats_mngr.py (dump accessors), warnings_mngr.py (classification).

Known reference quirks preserved deliberately:
  - get_db_size_json only emits the "Total Growth (For i/n CF-s)" key
    when i != n (json_outputter.py:82-90 assigns inside the else).
  - get_db_size_bytes_info_at_end only counts cfs present in the LAST
    stats dump (calc_utils.py:52-72).
Memory Reporting blocks ARE parsed (document.try_mem_rep) and rendered
(_mem_rep_section) — the synthetic corpus log exercises them; logs with
no reports render "No Memory Reports" like the reference.
"""

from __future__ import annotations

import json
import re
import time as _time
from bisect import bisect
from datetime import datetime

# ------------------------------------------------------------ constants

NO_CF = "DB_WIDE"
DATA_UNAVAILABLE = "Data Unavailable"
UNKNOWN_VALUE = "UNKNOWN"
INVALID_FILTER_POLICY = "INVALID-FILTER-POLICY"
SANITIZED_NO_VALUE = "Missing"
RAW_NULL_PTR = "Uninitialised"
SANITIZED_NULL_PTR = f"Pointer ({RAW_NULL_PTR})"
CFS_COMMON_KEY = "CF-s (Common)"
CFS_SPECIFIC_KEY = "CF-s (Specific)"
TABLE_KEY = "Block-Based Table"
CF_NAMES_KEY = "cf names"

_SECTION_PREFIX = {"db_wide": "DBOptions",
                   "cf": "CFOptions",
                   "table": "TableOptions.BlockBasedTable"}
_PTR_RE = re.compile(r"0x[\dA-Fa-f]+")
_CF_BRACKET_RE = re.compile(r"\[(?P<cf>[\w\]]*)\]", re.MULTILINE)
_WRITE_DELAY_RE = re.compile(r"\[(?P<cf>[\w\]]*)\]\s*Stalling writes")
_WRITE_STOP_RE = re.compile(r"\[(?P<cf>[\w\]]*)\]\s*Stopping writes")
_LEVEL_KEY_RE = re.compile(r"LEVEL-(\d+)")

FLUSH_BUCKETS_MB = [2, 10, 32, 64]


# ------------------------------------------------------------ formatting

def human_bytes(n) -> str:
    """utils.get_human_readable_num_bytes (no int coercion: the
    reference str()s whatever numeric type it gets)."""
    if n < 2 ** 10:
        return f"{n} B"
    for unit, div in (("KB", 2 ** 10), ("MB", 2 ** 20), ("GB", 2 ** 30),
                      ("TB", 2 ** 40)):
        if n < div * 1024 or unit == "TB":
            return f"{float(n) / div:.1f} {unit}"
    raise AssertionError


def human_num(n) -> str:
    """utils.get_human_readable_number (raw str() below 10^4 — floats
    keep their full repr, exactly like the reference)."""
    assert n >= 0
    if n < 10 ** 4:
        return str(n)
    if n < 10 ** 7:
        return f"{float(n) / 10 ** 3:.1f} K"
    if n < 10 ** 10:
        return f"{float(n) / 10 ** 6:.1f} M"
    return f"{float(n) / 10 ** 9:.1f} G"


def dd_hh_mm_ss(seconds) -> str:
    seconds = int(seconds)
    days = int(seconds / 86400)
    return _time.strftime(f"{days}d %Hh %Mm %Ss", _time.gmtime(seconds))


def _parse_ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y/%m/%d-%H:%M:%S.%f")


def time_diff_seconds(t1: str, t2: str) -> float:
    return (_parse_ts(t2) - _parse_ts(t1)).total_seconds()


def format_value(value, suffix=None, conv_func=None):
    """display_utils.format_value."""
    if value is None:
        return "No Information"
    if conv_func is not None:
        value = conv_func(value)
    return f"{value} {suffix}" if suffix is not None else f"{value}"


# -------------------------------------------------- sanitize (db_options)

def _san_bool(value, include_int):
    if isinstance(value, str):
        low = value.lower()
        if low == "false":
            return True, "False"
        if low == "true":
            return True, "True"
        if include_int and low == "0":
            return True, "False"
        if include_int and low == "1":
            return True, "True"
    return False, value


def _is_null_ptr(value):
    return isinstance(value, str) and value.lower() in (
        "none", "(nil)", "nil", "nullptr", "null", "0x0")


def sanitize_value(value):
    """db_options.get_sanitized_value; returns (sanitized, type) with
    type in {'no_value','bool','null_ptr','pointer','other'}."""
    if value is None:
        return SANITIZED_NO_VALUE, "no_value"
    is_bool, v = _san_bool(value, include_int=False)
    if is_bool:
        return v, "bool"
    if _is_null_ptr(value):
        return SANITIZED_NULL_PTR, "null_ptr"
    if isinstance(value, str):
        m = _PTR_RE.findall(value.strip())
        if m:
            return f"Pointer ({m[0]})", "pointer"
    return value, "other"


def values_differ(base, new):
    """db_options.are_non_sanitized_values_different."""
    sb, tb = sanitize_value(base)
    sn, tn = sanitize_value(new)
    if tb == "bool" or tn == "bool":
        _, sb = _san_bool(sb, include_int=True)
        _, sn = _san_bool(sn, include_int=True)
    if tb == tn == "pointer":
        return False
    return sb != sn


def diff_pair(base, new):
    """db_options.get_sanitized_options_diff(expect_diff=True)."""
    sb, tb = sanitize_value(base)
    sn, tn = sanitize_value(new)
    if tb == "bool" or tn == "bool":
        _, sb = _san_bool(sb, include_int=True)
        _, sn = _san_bool(sn, include_int=True)
    return sb, sn


def sanitized_to_raw_ptr(sanitized):
    """db_options.sanitized_to_raw_ptr_value (None on non-pointer)."""
    if sanitized is None:
        return None
    s = sanitized.strip()
    if s == SANITIZED_NULL_PTR:
        return RAW_NULL_PTR
    m = re.fullmatch(r"Pointer \((0x[\dA-Fa-f]+)\)", s)
    return m.group(1) if m else None


# ----------------------------------------------------------- records view

class View:
    """Lightweight manager-state rebuild from one document's records."""

    def __init__(self, records):
        self.by_kind = {}
        for r in records:
            self.by_kind.setdefault(r["kind"], []).append(r)

        # metadata: first occurrence wins (log_file.py:36-133)
        self.meta = {}
        for r in self.by_kind.get("metadata", []):
            self.meta.setdefault(r["name"], r["msg"])

        # cf registry in discovery order (cfs_infos.py:63-236)
        self.cf_order, self._cf_info = [], {}
        for r in self.by_kind.get("cf_found", []):
            if r["cf"] not in self._cf_info:
                self.cf_order.append(r["cf"])
                self._cf_info[r["cf"]] = {
                    "auto": r["attrs"].get("auto_generated") == "True",
                    "has_options": r["attrs"].get("has_options") == "True"}

        # options: {section: {cf: {name: raw}}} in appearance order
        self.opts = {}
        self.opt_cf_order = []
        for r in self.by_kind.get("option", []):
            section = r["attrs"].get("section")
            cf = NO_CF if section == "db_wide" else r["cf"]
            sec = self.opts.setdefault(section, {})
            sec.setdefault(cf, {})[r["name"]] = r["msg"]
            if section in ("cf", "table") and cf not in self.opt_cf_order:
                self.opt_cf_order.append(cf)

        # counters / histograms, entries in document order
        self.counters, self.histograms = {}, {}
        for r in self.by_kind.get("counter", []):
            self.counters.setdefault(r["name"], []).append(
                {"time": r["ts"], "value": r["value"]})
        for r in self.by_kind.get("histogram", []):
            a = r["attrs"]
            self.histograms.setdefault(r["name"], []).append(
                {"time": r["ts"],
                 "values": {"P50": float(a["P50"]), "P95": float(a["P95"]),
                            "P99": float(a["P99"]), "P100": float(a["P100"]),
                            "Count": int(a["Count"]), "Sum": int(a["Sum"]),
                            "Average": float(a["Average"])}})

        # compaction-stats dumps: ordered {time: {cf: {level_key: attrs}}}
        self.comp_dumps = {}
        for r in self.by_kind.get("comp_stats", []):
            self.comp_dumps.setdefault(r["ts"], {}).setdefault(
                r["cf"], {})[r["name"]] = r["attrs"]

        # events with parsed payloads
        self.events = []
        for r in self.by_kind.get("event", []):
            try:
                p = json.loads(r["payload_json"]) if r["payload_json"] else {}
            except ValueError:
                p = {}
            self.events.append({
                "seq": r["seq"], "ts": r["ts"], "type": r["event_type"],
                "cf": r["cf"], "job_id": r["job_id"],
                "micros": r["time_micros"], "p": p})

        # warnings in document order
        self.warnings = self.by_kind.get("warning", [])

        # cumulative writes (db-wide stats)
        self.cumulative_writes = [
            {"time": r["ts"],
         "num_keys": int(r["attrs"]["num_keys"]),
             "ingest": int(r["attrs"]["ingest"]),
             "ingest_rate_mbps": float(r["attrs"]["ingest_rate_mbps"])}
            for r in self.by_kind.get("cumulative_writes", [])]

        # read latency (cf file histogram): {cf: ordered {time: {level: s}}}
        self.read_latency = {}
        for r in self.by_kind.get("read_latency", []):
            a = r["attrs"]
            self.read_latency.setdefault(r["cf"], {}).setdefault(
                r["ts"], {})[int(r["value"])] = {
                "count": int(a["count"]), "average": float(a["average"]),
                "max": float(a["max"])}

        # memory reports: ordered {time: report} (mem_rep_parser.py)
        self.mem_reps = {}
        for r in self.by_kind.get("memrep", []):
            rep = self.mem_reps.setdefault(
                r["ts"], {"arena_total": None, "arena": {},
                          "cfs_total": None, "cfs": {}, "misc": {}})
            name = r["name"]
            if name == "arena_total":
                rep["arena_total"] = r["msg"]
            elif name == "arena":
                rep["arena"][r["attrs"]["entity"]] = r["msg"]
            elif name == "cfs_total":
                rep["cfs_total"] = r["msg"]
            elif name == "cf":
                rep["cfs"][r["cf"]] = r["msg"]
            elif name == "misc":
                rep["misc"][r["attrs"]["entity"]] = r["msg"]

        # block cache stats dumps (stats_mngr.py:855-952 structure)
        self.caches = {}
        for r in self.by_kind.get("block_cache", []):
            a, cid, ts = r["attrs"], r["name"], r["ts"]
            cache = self.caches.setdefault(cid, {"Capacity": 0, "Usage": 0})
            row = a.get("row")
            if row == "capacity":
                cache["Capacity"] = int(a["capacity"])
            elif row == "role":
                entry = cache.setdefault(ts, {"Usage": 0})
                entry[a["role"]] = {"Count": int(a["count"]),
                                    "Size": int(a["size"]),
                                    "Portion": a["portion"]}
            elif row == "usage":
                entry = cache.setdefault(ts, {"Usage": 0})
                entry["Usage"] = int(a["usage"])
                cache["Usage"] = int(a["usage"])
            elif row == "cf_role":
                entry = cache.setdefault(ts, {"Usage": 0})
                entry.setdefault("CF-s", {}).setdefault(
                    r["cf"], {})[a["role"]] = int(a["size"])

        self._files = None

    # ---------------------------------------------------------- accessors

    def cfs_names(self, include_auto_generated=False):
        if include_auto_generated:
            return list(self.cf_order)
        return [c for c in self.cf_order if not self._cf_info[c]["auto"]]

    def cfs_names_with_options(self):
        return [c for c in self.cf_order
                if self._cf_info[c]["has_options"]
                and not self._cf_info[c]["auto"]]

    def has_auto_generated_cfs(self):
        return any(i["auto"] for i in self._cf_info.values())

    def option_cfs_names(self):
        """DatabaseOptions.get_cfs_names: cf-s appearing in options."""
        return list(self.opt_cf_order)

    def get_cf_option(self, cf, name):
        return self.opts.get("cf", {}).get(cf, {}).get(name)

    def get_cf_table_option(self, cf, name):
        return self.opts.get("table", {}).get(cf, {}).get(name)

    def get_db_wide_option(self, name):
        return self.opts.get("db_wide", {}).get(NO_CF, {}).get(name)

    # NOTE: options whose NAME contains a '.' (e.g.
    # sst_file_manager.rate_bytes_per_sec, bottommost_compression_opts.*)
    # are dropped from every FullNames-based surface: the reference's
    # get_all_options -> get_options round-trip loses them because
    # parse_full_option_name keeps only the last dot-component
    # (db_options.py:66-69), so the lookup back into options_dict misses.

    def full_names_options(self, cf):
        """{full-name: sanitized value} for one cf, appearance order."""
        out = {}
        for section in ("cf", "table"):
            for name, raw in self.opts.get(section, {}).get(cf, {}).items():
                if "." in name:
                    continue
                out[f"{_SECTION_PREFIX[section]}.{name}"] = \
                    sanitize_value(raw)[0]
        return out

    def db_wide_full_names_options(self):
        out = {}
        for name, raw in self.opts.get("db_wide", {}).get(NO_CF, {}).items():
            if "." in name:
                continue
            out[f"DBOptions.{name}"] = sanitize_value(raw)[0]
        return out

    # counters (counters.py:163-276)
    def last_counter_entry(self, name):
        e = self.counters.get(name)
        return e[-1] if e else {}

    def first_counter_entry(self, name):
        e = self.counters.get(name)
        return e[0] if e else {}

    def last_counter_value(self, name, default=0):
        e = self.last_counter_entry(name)
        return e["value"] if e else default

    def first_counter_value(self, name, default=0):
        e = self.first_counter_entry(name)
        return e["value"] if e else default

    def has_counters(self):
        return bool(self.counters)

    def last_histogram_entry(self, name, non_zero=False):
        e = self.histograms.get(name)
        if not e:
            return {}
        if non_zero and e[-1]["values"]["Count"] == 0:
            return {}
        return e[-1]

    # compaction stats (stats_mngr.py:405-550)
    def first_comp_dump(self):
        for t, d in self.comp_dumps.items():
            return t, d
        return None, None

    def last_comp_dump(self):
        t = None
        for t in self.comp_dumps:
            pass
        return (t, self.comp_dumps[t]) if t is not None else (None, None)

    def cf_comp_entries(self, cf):
        return [(t, d[cf]) for t, d in self.comp_dumps.items() if cf in d]

    @staticmethod
    def sum_field(cf_entry, field):
        line = cf_entry.get("SUM")
        if line is None or field not in line:
            return None
        return line[field]

    @staticmethod
    def levels_field(cf_entry, field):
        out = {}
        for key, line in cf_entry.items():
            m = _LEVEL_KEY_RE.fullmatch(key)
            if m and field in line:
                out[int(m.group(1))] = line[field]
        return out or None

    def cf_size_bytes_at_end(self, cf):
        entries = self.cf_comp_entries(cf)
        if not entries:
            return None
        v = self.sum_field(entries[-1][1], "size_bytes")
        return int(v) if v is not None else None

    # events / files monitor (db_files.py:126-300)
    def events_of_type(self, cf, etype):
        return [e for e in self.events
                if e["cf"] == cf and e["type"] == etype]

    def files_monitor(self):
        """Replay of creation/deletion events (db_files.py:161-247)."""
        if self._files is not None:
            return self._files
        files, order = {}, []
        for e in self.events:
            if e["type"] == "table_file_creation":
                num = e["p"].get("file_number")
                if num is None or num in files:
                    continue
                tp = e["p"].get("table_properties") or {}
                fp = tp.get("filter_policy")
                uses_filter = fp is not None and fp != "nullptr"
                files[num] = {
                    "cf": e["cf"], "created": e["ts"], "deleted": None,
                    "file_size": int(e["p"].get("file_size") or 0),
                    "data_size": int(tp.get("raw_key_size") or 0)
                    + int(tp.get("raw_value_size") or 0),
                    "index_size": int(tp.get("index_size") or 0),
                    "filter_size": int(tp.get("filter_size") or 0),
                    "filter_policy": fp if uses_filter else None,
                    "num_filter_entries":
                        int(tp.get("num_filter_entries") or 0)
                        if uses_filter else 0,
                    "compression": tp.get("compression") or None,
                }
                order.append(num)
            elif e["type"] == "table_file_deletion":
                num = e["p"].get("file_number")
                info = files.get(num)
                if info is None or info["deleted"] is not None:
                    continue
                info["deleted"] = e["ts"]
        self._files = ({n: files[n] for n in order})
        return self._files

    def files_of_cf(self, cf):
        return [f for f in self.files_monitor().values() if f["cf"] == cf]


# --------------------------------------------------- files-derived stats

class _BlockStats:
    """db_files.BlockLiveFileStats replay over live files."""

    def __init__(self):
        self.num_created = 0
        self.num_live = 0
        self.total_created = 0
        self.curr_live = 0
        self.largest = 0
        self.largest_time = None

    def created(self, size, when):
        if size == 0:
            return
        self.num_created += 1
        self.num_live += 1
        self.total_created += size
        self.curr_live += size
        if self.largest < size:
            self.largest, self.largest_time = size, when

    def deleted(self, size):
        if size == 0:
            return
        self.num_live -= 1
        self.curr_live -= size

    def avg(self):
        return self.total_created / self.num_created if self.num_created \
            else 0


def _blocks_stats_per_cf(view: View):
    """{cf: {block_type: _BlockStats}} + per-cf live counts, replayed in
    event order (db_files.py:161-247)."""
    per_cf = {}
    live = {}
    for f in view.files_monitor().values():
        cf = f["cf"]
        if cf not in per_cf:
            per_cf[cf] = {"DATA": _BlockStats(), "INDEX": _BlockStats(),
                          "FILTER": _BlockStats()}
            live[cf] = 0
        per_cf[cf]["DATA"].created(f["data_size"], f["created"])
        per_cf[cf]["INDEX"].created(f["index_size"], f["created"])
        per_cf[cf]["FILTER"].created(f["filter_size"], f["created"])
        live[cf] += 1
        if f["deleted"] is not None:
            per_cf[cf]["DATA"].deleted(f["data_size"])
            per_cf[cf]["INDEX"].deleted(f["index_size"])
            per_cf[cf]["FILTER"].deleted(f["filter_size"])
            live[cf] -= 1
    return per_cf, live


def calc_cf_files_stats(view: View, cfs_names):
    """db_files.calc_cf_files_stats: aggregated block stats + per-cf
    filter policy/avg-bpk; None when the cf-s have no files."""
    per_cf, _live = _blocks_stats_per_cf(view)

    blocks = {}
    for bt in ("DATA", "INDEX", "FILTER"):
        agg = None
        for cf in cfs_names:
            if cf not in per_cf:
                continue
            s = per_cf[cf][bt]
            if agg is None:
                agg = _BlockStats()
                agg.__dict__.update(s.__dict__)
            else:
                agg.num_created += s.num_created
                agg.num_live += s.num_live
                agg.total_created += s.total_created
                agg.curr_live += s.curr_live
                if agg.largest < s.largest:
                    agg.largest, agg.largest_time = s.largest, s.largest_time
        blocks[bt] = agg

    num_files = 0
    filter_specific = {}
    for cf in cfs_names:
        cf_files = view.files_of_cf(cf)
        num_files += len(cf_files)
        if not cf_files:
            continue
        filter_policy = None
        total_filter, total_entries = 0, 0
        for i, f in enumerate(cf_files):
            if i == 0:
                filter_policy = f["filter_policy"]
            elif filter_policy != INVALID_FILTER_POLICY and \
                    filter_policy != f["filter_policy"]:
                filter_policy = INVALID_FILTER_POLICY
                continue
            total_filter += f["filter_size"]
            total_entries += f["num_filter_entries"]
        avg_bpk = 0
        if filter_policy is not None and \
                filter_policy != INVALID_FILTER_POLICY and total_entries > 0:
            avg_bpk = (8 * total_filter) / total_entries
        filter_specific[cf] = {"filter_policy": filter_policy,
                               "avg_bpk": avg_bpk}

    if num_files == 0:
        return None
    return {"blocks": blocks, "filter_specific": filter_specific}


def calc_files_filter_stats(view: View, cfs_names):
    """calc_utils.calc_files_filter_stats."""
    stats = {}
    options_fp = {cf: view.get_cf_table_option(cf, "filter_policy")
                  for cf in view.option_cfs_names()}
    for cf in cfs_names:
        cf_stats = calc_cf_files_stats(view, [cf])
        if cf_stats:
            fs = cf_stats["filter_specific"][cf]
            stats[cf] = {"filter_policy": fs["filter_policy"],
                         "avg_bpk": fs["avg_bpk"]}
        elif cf in options_fp:
            stats[cf] = {"filter_policy": options_fp[cf], "avg_bpk": None}
        else:
            stats[cf] = {"filter_policy": INVALID_FILTER_POLICY,
                         "avg_bpk": None}
    return stats


# --------------------------------------------------------- flush pairing

def flush_flow_pairs(view: View, cf):
    """events_mngr.get_cf_flow_events(FLUSH, cf): (start, finish|None)
    pairs.  A finish binds to the MOST RECENT already-seen start of the
    same (job, cf) even if that start was already matched (the earlier
    match is overwritten — events.py:910-931 + 435-460), so each start
    keeps the LAST finish that bound to it."""
    starts = view.events_of_type(cf, "flush_started")
    finishes = view.events_of_type(cf, "flush_finished")
    match = {}
    for f in finishes:
        cands = [s for s in starts
                 if s["seq"] < f["seq"] and s["job_id"] == f["job_id"]]
        if cands:
            match[cands[-1]["seq"]] = f  # later finishes overwrite
    return [(s, match.get(s["seq"])) for s in starts]


# ------------------------------------------------------------- sections

def _user_opers_stats(view: View):
    """calc_utils.get_user_operations_stats."""
    if not view.has_counters():
        return {"reason": "No Statistics"}
    written = view.last_counter_value("rocksdb.number.keys.written")
    read = view.last_counter_value("rocksdb.number.keys.read")
    seek = view.last_counter_value("rocksdb.number.db.seek")
    total = written + read + seek
    out = {"written": written, "read": read, "seek": seek, "total": total,
           "reason": None}
    if total > 0:
        out["pct"] = {k: 100.0 * out[k] / total
                      for k in ("written", "read", "seek")}
    return out


def _delete_opers_stats(view: View, cfs_names):
    """calc_utils.calc_delete_opers_stats."""
    total_entries, total_deletes = 0, 0
    has_any = False
    reason = None
    for cf in cfs_names:
        fs = view.events_of_type(cf, "flush_started")
        if not fs:
            reason = "No Flushes"
            continue
        cf_entries = sum(int(e["p"].get("num_entries") or 0) for e in fs)
        cf_deletes = sum(int(e["p"].get("num_deletes") or 0) for e in fs)
        if cf_entries:
            has_any = True
            total_entries += cf_entries
            total_deletes += cf_deletes
        else:
            reason = reason or "Unknown"
    if not has_any:
        return {"reason": reason or "Unknown"}
    out = {"entries": total_entries, "deletes": total_deletes,
           "reason": None}
    if total_entries > 0:
        out["pct"] = 100.0 * total_deletes / total_entries
    return out


def _opers_disp(percent, num, total, oper_name, reason):
    """display_utils.get_disp_value."""
    if reason is not None:
        return f"{DATA_UNAVAILABLE} ({reason})"
    if total > 0 and num > 0:
        return f"{percent:.1f}% ({num}/{total})"
    return f"0 (No {oper_name} Operations)"


def _table_creation_stats(view: View, cf):
    """calc_utils.calc_cf_table_creation_stats."""
    evs = view.events_of_type(cf, "table_file_creation")
    tot_e = sum(int((e["p"].get("table_properties") or {})
                    .get("num_entries") or 0) for e in evs)
    tot_k = sum(int((e["p"].get("table_properties") or {})
                    .get("raw_key_size") or 0) for e in evs)
    tot_v = sum(int((e["p"].get("table_properties") or {})
                    .get("raw_value_size") or 0) for e in evs)
    avg_k = int(tot_k / tot_e) if evs and tot_e > 0 else 0
    avg_v = int(tot_v / tot_e) if evs and tot_e > 0 else 0
    return {"n": len(evs), "entries": tot_e, "keys": tot_k, "values": tot_v,
            "avg_key": avg_k, "avg_value": avg_v}


def _db_size_at_end(view: View, cfs_names):
    """calc_utils.get_db_size_bytes_info_at_end."""
    t, dump = view.last_comp_dump()
    if dump is None:
        return None, None
    size, size_time = 0, None
    for cf in cfs_names:
        if cf not in dump:
            continue
        if size_time is None:
            size_time = t
        v = View.sum_field(dump[cf], "size_bytes")
        size += int(v) if v is not None else 0
    if size_time is None:
        return None, None
    return size, size_time


def _ingest_info(view: View):
    """calc_utils.get_db_ingest_info."""
    if not view.cumulative_writes:
        return None
    last = view.cumulative_writes[-1]
    return {"time": last["time"], "ingest": last["ingest"],
            "rate": last["ingest_rate_mbps"]}


def _classify_warning(msg):
    if _WRITE_DELAY_RE.search(msg.strip()):
        return "Write-Delay"
    if _WRITE_STOP_RE.search(msg.strip()):
        return "Write-Stop"
    return "Other"


def _warning_cf(cfs_names, msg):
    """warnings_mngr.determine_warning_msg_cf."""
    cands = set(_CF_BRACKET_RE.findall(msg))
    hits = cands & set(cfs_names)
    if len(hits) == 1:
        return next(iter(hits))
    return NO_CF


def _processed_warnings(view: View, cfs_names):
    """{type: {cf: {category: [(time, msg)]}}} (warnings_mngr.py:108-146)."""
    out = {}
    for r in view.warnings:
        wt = r["warn_type"]
        cat = _classify_warning(r["msg"])
        cf = _warning_cf(cfs_names, r["msg"])
        out.setdefault(wt, {}).setdefault(cf, {}).setdefault(cat, []).append(
            (r["ts"], r["msg"]))
    return out


def _warn_messages(of_type):
    """calc_utils.get_warn_messages (time-keyed dict)."""
    if not of_type:
        return None
    msgs = {}
    for cf_data in of_type.values():
        for infos in cf_data.values():
            for t, msg in infos:
                msgs[t] = msg
    return msgs


def _general_section(view: View, name, warnings_all):
    """get_general_json: the raw db-wide info dict with the None-valued
    time keys removed, plus the per-CF table."""
    d = dict(_db_wide_info(view, name, warnings_all))
    if d["DB Size Time"] is None:
        del d["DB Size Time"]
    if d["Ingest Time"] is None:
        del d["Ingest Time"]
    d["CF-s"] = _general_cfs_section(view, view.cfs_names())
    return d


def _db_wide_info(view: View, name, warnings_all):
    """display_utils.prepare_db_wide_info_for_display (raw: time keys
    present even when None — the console renderer needs them)."""
    cfs_names = view.cfs_names()
    d = {}
    d["Name"] = name
    d["Start Time"] = view.meta.get("start_time")
    d["End Time"] = view.meta.get("end_time")
    span = time_diff_seconds(d["Start Time"], d["End Time"]) \
        if d["Start Time"] and d["End Time"] else 0
    d["Log Time Span"] = dd_hh_mm_ss(span)
    d["Creator"] = view.meta.get("product_name")
    d["Version"] = f"{view.meta.get('version')} " \
                   f"[{view.meta.get('git_hash')}]"

    size, size_time = _db_size_at_end(view, cfs_names)
    d["DB Size"] = human_bytes(size) if size is not None else \
        DATA_UNAVAILABLE
    d["DB Size Time"] = size_time

    uo = _user_opers_stats(view)
    cw = view.cumulative_writes
    num_keys_written = None
    if cw:
        if uo.get("written"):
            num_keys_written = max(uo["written"], cw[-1]["num_keys"])
        else:
            num_keys_written = cw[-1]["num_keys"]
    d["Num Keys Written"] = human_num(num_keys_written) \
        if num_keys_written is not None else DATA_UNAVAILABLE

    tot_e = tot_k = tot_v = 0
    for cf in cfs_names:
        s = _table_creation_stats(view, cf)
        tot_e += s["entries"]
        tot_k += s["keys"]
        tot_v += s["values"]
    d["Avg. Written Key Size"] = human_bytes(int(tot_k / tot_e)) \
        if tot_e > 0 else DATA_UNAVAILABLE
    d["Avg. Written Value Size"] = human_bytes(int(tot_v / tot_e)) \
        if tot_e > 0 else DATA_UNAVAILABLE

    warns = warnings_all.get("WARN", {})
    d["Num Warnings"] = sum(len(infos) for cf_d in warns.values()
                            for infos in cf_d.values())

    errors = _warn_messages(warnings_all.get("ERROR"))
    fatals = _warn_messages(warnings_all.get("FATAL"))
    d["Error Messages"] = errors if errors is not None \
        else "No Error Messages"
    d["Fatal Messages"] = fatals if fatals is not None \
        else "No Fatal Messages"

    ii = _ingest_info(view)
    if ii is not None:
        d["Ingest"] = human_bytes(ii["ingest"])
        d["Ingest Rate"] = f"{ii['rate']} MBps"
        d["Ingest Time"] = ii["time"]
    else:
        d["Ingest"] = "No Ingest Info Available"
        d["Ingest Rate"] = "No Ingest Info Available"
        d["Ingest Time"] = None  # removed by get_general_json

    # notable entities (display_utils.notable_entities: statistics)
    stats_opt = view.get_db_wide_option("statistics")
    if stats_opt is not None:
        if sanitize_value(stats_opt)[1] == "null_ptr":
            d["Statistics"] = "No Statistics"
        else:
            d["Statistics"] = "Available"

    reason = uo.get("reason")
    if reason is None:
        d["Writes"] = _opers_disp(uo["pct"]["written"] if "pct" in uo
                                  else None, uo["written"], uo["total"],
                                  "Write", None)
        d["Reads"] = _opers_disp(uo["pct"]["read"] if "pct" in uo else None,
                                 uo["read"], uo["total"], "Read", None)
        d["Seeks"] = _opers_disp(uo["pct"]["seek"] if "pct" in uo else None,
                                 uo["seek"], uo["total"], "Seek", None)
    else:
        for k in ("Writes", "Reads", "Seeks"):
            d[k] = f"{DATA_UNAVAILABLE} ({reason})"

    do = _delete_opers_stats(view, cfs_names)
    if do["reason"] is None:
        d["Deleted (Flushed) Entries"] = _opers_disp(
            do.get("pct"), do["deletes"], do["entries"], "Delete", None)
    else:
        d["Deleted (Flushed) Entries"] = \
            f"{DATA_UNAVAILABLE} ({do['reason']})"

    num_cfs_info = ("Please see the 'Ability to determine the number of "
                    "cf-s' section in the log parser's documentation for "
                    "more information")
    if not view.has_auto_generated_cfs():
        total_num_cfs = len(view.cfs_names(include_auto_generated=True))
        d["Num CF-s"] = total_num_cfs
        if total_num_cfs != len(view.cfs_names_with_options()):
            d["Num CF-s Info"] = num_cfs_info
    else:
        d["Num CF-s"] = "Can't be accurately determined"
        d["Num CF-s Info"] = num_cfs_info

    return d


def _applicable_cf_options(view: View):
    """calc_utils.get_applicable_cf_options (raw values)."""
    out = {"compaction_style": {}, "compression": {}, "filter_policy": {}}
    for cf in view.option_cfs_names():
        out["compaction_style"][cf] = view.get_cf_option(
            cf, "compaction_style")
        out["compression"][cf] = view.get_cf_option(cf, "compression")
        out["filter_policy"][cf] = view.get_cf_table_option(
            cf, "filter_policy")
    return out


def _cf_filter_disp(cf_stats, as_dict):
    """display_utils.prepare_cf_filter_stats_for_display."""
    fp = cf_stats["filter_policy"]
    if not fp:
        return "Filter Data Not Available"
    if fp == INVALID_FILTER_POLICY:
        return "Filter Data Not Available"
    if sanitize_value(fp)[1] == "null_ptr":
        return "No Filter"
    bpk = cf_stats["avg_bpk"]
    bpk_str = f"{bpk:.1f}" if bpk is not None else "unknown bpk"
    if as_dict:
        return {"Filter-Policy": fp, "Avg. BPK": bpk_str}
    return f"{fp} ({bpk_str})"


def _general_cfs_section(view: View, cfs_names):
    """display_utils.prepare_general_cf_info_for_display."""
    filter_stats = calc_files_filter_stats(view, cfs_names)
    cf_opts = _applicable_cf_options(view)
    out = {}
    for cf in cfs_names:
        tc = _table_creation_stats(view, cf)
        size = view.cf_size_bytes_at_end(cf)
        e = {}
        e["CF Size"] = human_bytes(size) if size is not None else \
            DATA_UNAVAILABLE
        e["Avg. Key Size"] = human_bytes(tc["avg_key"])
        e["Avg. Value Size"] = human_bytes(tc["avg_value"])
        style = cf_opts["compaction_style"].get(cf)
        e["Compaction Style"] = style if cf in cf_opts["compaction_style"] \
            and style is not None else UNKNOWN_VALUE
        if cf in cf_opts["compression"] and \
                cf_opts["compression"][cf] is not None:
            e["Compression"] = cf_opts["compression"][cf]
        elif view.get_cf_option(cf, "compression[0]") is not None:
            e["Compression"] = "Per-Level"
        else:
            e["Compression"] = UNKNOWN_VALUE
        e["Filter-Policy"] = _cf_filter_disp(
            filter_stats.get(cf, {"filter_policy": None, "avg_bpk": None}),
            as_dict=False)
        out[cf] = e
    return out


# ---- options section

def _unified_cfs_options(view: View):
    """calc_utils.get_cfs_common_and_specific_options (sanitized)."""
    cfs = view.option_cfs_names()
    per_cf = {cf: view.full_names_options(cf) for cf in cfs}
    common, specific = {}, {cf: dict(per_cf[cf]) for cf in cfs}
    if not cfs:
        return common, specific
    first = cfs[0]
    for name in list(specific[first].keys()):
        try:
            values = [specific[cf][name] for cf in cfs]
        except KeyError:
            continue
        if len(set(values)) != 1:
            continue
        common[name] = values[0]
        for cf in cfs:
            del specific[cf][name]
    return common, specific


def _split_cf_table(flat, prep=None):
    """DatabaseOptions.prepare_flat_full_names_cf_options_for_display."""
    if prep is None:
        def prep(v):
            return v
    cf_d, table_d = {}, {}
    for full, value in flat.items():
        if full.startswith("TableOptions.BlockBasedTable."):
            table_d[full[len("TableOptions.BlockBasedTable."):]] = \
                prep(value)
        elif full.startswith("CFOptions."):
            cf_d[full[len("CFOptions."):]] = prep(value)
    return cf_d, table_d


def _cfs_diff(baseline_flat, baseline_cf, new_flat, new_cf):
    """DatabaseOptions.get_cfs_options_diff over flat per-cf dicts
    {full_name: value}; returns ordered {full_name: (base, new)} or None.
    Both inputs are single-cf flat dicts (sanitized values)."""
    seen = set()
    union = [n for n in list(baseline_flat) + list(new_flat)
             if not (n in seen or seen.add(n))]
    diff = {}
    for name in union:
        in_b, in_n = name in baseline_flat, name in new_flat
        if not in_b:
            diff[name] = diff_pair(None, new_flat[name])
        elif not in_n:
            diff[name] = diff_pair(baseline_flat[name], None)
        elif values_differ(baseline_flat[name], new_flat[name]):
            diff[name] = diff_pair(baseline_flat[name], new_flat[name])
    return diff or None


def _diff_tuple_disp(pair):
    return {"Baseline": pair[0], "Parsed Log": pair[1]}


def _options_section(view: View, baseline):
    # Diff vs baseline
    if baseline is None:
        diff_disp = "NO BASELINE FOUND"
    else:
        b_db_wide = {n: v for n, v in baseline["options"].items()
                     if n.startswith("DBOptions.")}
        db_wide_diff = _cfs_diff(b_db_wide, NO_CF,
                                 view.db_wide_full_names_options(), NO_CF)
        diff_disp = {
            "Baseline": f"{baseline['version']} ({view.meta.get('product_name')})",
            "Baseline Log": baseline["path"],
        }
        if db_wide_diff is None:
            diff_disp["DB"] = "No Diff"
        else:
            db = {}
            for full, pair in db_wide_diff.items():
                if full.startswith("DBOptions."):
                    db[full[len("DBOptions."):]] = _diff_tuple_disp(pair)
            if db:
                diff_disp["DB"] = db

        common, specific = _unified_cfs_options(view)
        b_cf_all = {n: v for n, v in baseline["options"].items()
                    if not n.startswith("DBOptions.")}
        b_common = {n: v for n, v in b_cf_all.items() if n in common}
        common_diff = _cfs_diff(b_common, "default", common, "dummy") \
            if common else None

        cfs_disp = {}
        if common_diff:
            cf_d, table_d = _split_cf_table(common_diff, _diff_tuple_disp)
            cfs_disp[CFS_COMMON_KEY] = {"CF": cf_d, TABLE_KEY: table_d}
        else:
            cfs_disp[CFS_COMMON_KEY] = "No Common Diff"

        b_specific = {n: v for n, v in b_cf_all.items() if n not in common}
        spec_disp = {}
        for cf, cf_options in specific.items():
            cf_diff = _cfs_diff(b_specific, "default", cf_options, cf)
            if cf_diff is not None:
                cf_d, table_d = _split_cf_table(cf_diff, _diff_tuple_disp)
                spec_disp[cf] = {"CF": cf_d, TABLE_KEY: table_d}
        cfs_disp[CFS_SPECIFIC_KEY] = spec_disp or "No CF-s Specific Diff"
        diff_disp["CF-s"] = cfs_disp

    # All options
    common, specific = _unified_cfs_options(view)
    if common:
        cf_d, table_d = _split_cf_table(common)
        common_disp = {"CF": cf_d, TABLE_KEY: table_d}
    else:
        common_disp = "No Common Options to All CF-s"
    spec_disp = {}
    for cf, cf_options in specific.items():
        if cf_options:
            cf_d, table_d = _split_cf_table(cf_options)
            spec_disp[cf] = {
                "CF": cf_d or "No Specific Options",
                TABLE_KEY: table_d or "No Specific Table Options"}
    all_options = {
        "DB": {n[len("DBOptions."):]: v
               for n, v in view.db_wide_full_names_options().items()},
        "CF-s": {CFS_COMMON_KEY: common_disp,
                 CFS_SPECIFIC_KEY: spec_disp or "No Specific CF-s Options"},
    }
    return {"Diff": diff_disp, "All Options": all_options}


# ---- DB-Size section

def _growth_str(start, end, end_files):
    """display_utils.get_growth_str."""
    start_str = human_bytes(start)
    if end is None:
        return f"{start_str} -> (UNKNOWN SIZE)"
    if start == end:
        if start > 0:
            return f"{start_str} (No Change)   [{end_files} Files]"
        return "Empty Level"
    end_str = human_bytes(end)
    delta = end - start
    sign = "+" if delta >= 0 else "-"
    return (f"{start_str} -> {end_str}  ({sign}{human_bytes(abs(delta))})"
            f"  [{end_files} Files]")


def _cfs_growth_info(view: View, cfs_names):
    """calc_utils.calc_cfs_growth_info."""
    growth = {cf: None for cf in cfs_names}
    _t, first = view.first_comp_dump()
    if first is None:
        return {}
    _t2, last = view.last_comp_dump()

    def per_level(dump, cf, field):
        if cf not in dump:
            return None
        return View.levels_field(dump[cf], field)

    for cf in first:
        growth[cf] = {}
        sizes = per_level(first, cf, "size_bytes")
        files = per_level(first, cf, "Num-Files")
        if sizes:
            for lvl in sizes:
                growth[cf][lvl] = [int(sizes[lvl]), int(files[lvl]),
                                   None, None]
    for cf in last:
        if growth.get(cf) is None:
            growth[cf] = {}
        sizes = per_level(last, cf, "size_bytes")
        files = per_level(last, cf, "Num-Files")
        if sizes:
            for lvl in sizes:
                prev = growth[cf].get(lvl)
                start_size = prev[0] if prev else None
                start_files = prev[1] if prev else None
                growth[cf][lvl] = [start_size, start_files,
                                   int(sizes[lvl]), int(files[lvl])]
    return growth


def _total_growth(cfs_growth):
    """calc_utils.calc_total_growth_info."""
    total = [None, None, None, None]

    def acc(t, add):
        for i in range(4):
            if add[i] is not None:
                t[i] = (t[i] or 0) + int(add[i])

    num_cfs = len(cfs_growth)
    num_included = 0
    for cf, levels in cfs_growth.items():
        if levels is None:
            continue
        cf_total = [None, None, None, None]
        ok = True
        for lvl, gi in levels.items():
            start, start_f, end, end_f = gi
            if start is None:
                if end is None:
                    ok = False
                    break
                elif end == 0:
                    acc(cf_total, [0, 0, 0, 0])
                else:
                    acc(cf_total, [0, 0, end, end_f])
            elif end is not None:
                acc(cf_total, gi)
            else:
                ok = False
                break
        if ok:
            num_included += 1
            acc(total, cf_total)
    return num_included, num_cfs, total


def _db_size_section(view: View, cfs_names):
    d = {}
    ii = _ingest_info(view)
    if ii:
        d["Ingest"] = {"Ingest": human_bytes(ii["ingest"]),
                       "Ingest Rate": f"{ii['rate']} MBps",
                       "Ingest Time": ii["time"]}
    else:
        d["Ingest"] = DATA_UNAVAILABLE

    # live files over ALL cfs seen by the files monitor
    per_cf, live_counts = _blocks_stats_per_cf(view)
    num_files = sum(live_counts.values())
    tot_data = sum(s["DATA"].curr_live for s in per_cf.values())
    tot_index = sum(s["INDEX"].curr_live for s in per_cf.values())
    tot_filter = sum(s["FILTER"].curr_live for s in per_cf.values())
    total = tot_data + tot_index + tot_filter
    # get_live_files_info always returns an (always-truthy) dataclass,
    # so json_outputter's DATA_UNAVAILABLE branch is dead code; the
    # zero-size case renders "No Live Files Info" instead
    # (calc_utils.py:506-537, display_utils.py:851-856).
    if total != 0:
        d["Live Files"] = {
            "Num Files": num_files,
            "Total Size (Uncompressed)": human_bytes(total),
            "Index Blocks":
                f"{human_bytes(tot_index)}  ({tot_index / total * 100:.1f}%)",
            "Filter Blocks":
                f"{human_bytes(tot_filter)}  "
                f"({tot_filter / total * 100:.1f}%)",
        }
    else:
        d["Live Files"] = "No Live Files Info"

    # files compression (calc_utils.get_files_compression_info)
    comp_info = {}
    for f in view.files_monitor().values():
        ct = f["compression"]
        if not ct or ct == "NoCompression":
            continue
        e = comp_info.setdefault(ct, {"n": 0, "comp": 0, "uncomp": 0})
        e["n"] += 1
        e["comp"] += f["file_size"]
        e["uncomp"] += f["data_size"] + f["index_size"] + f["filter_size"]
    if comp_info:
        d["Files Compression"] = {
            ct: {"Num Compressed Files": e["n"],
                 "Compression Ratio":
                     f"{e['comp'] / e['uncomp'] * 100:.1f}% "
                     f"({human_bytes(e['comp'])} / "
                     f"{human_bytes(e['uncomp'])})"}
            for ct, e in comp_info.items()}
    else:
        d["Files Compression"] = DATA_UNAVAILABLE

    growth = _cfs_growth_info(view, cfs_names)
    num_included, num_cfs, total_growth = _total_growth(growth)
    if num_included != num_cfs:
        # reference quirk: the key is only assigned inside the else
        # branch (json_outputter.py:82-90)
        if total_growth == [None, None, None, None]:
            tg = "Can't Calculate"
        else:
            tg = _growth_str(total_growth[0], total_growth[2],
                             total_growth[3])
        d[f"Total Growth (For {num_included}/{num_cfs} CF-s)"] = tg

    if not growth:
        d["CF-s Growth"] = "No Growth Information Available"
    else:
        cfs_disp = {}
        for cf, levels in growth.items():
            if levels is None or not levels:
                cfs_disp[cf] = "No Growth Information Available"
                continue
            cfs_disp[cf] = {}
            tot_start, tot_end, tot_files = 0, None, None
            for lvl, gi in sorted(levels.items()):
                start, _sf, end, end_f = gi
                if start is None:
                    start = 0
                cfs_disp[cf][f"Level {lvl}"] = _growth_str(start, end, end_f)
                tot_start += start
                if end is not None:
                    tot_end = (tot_end or 0) + int(end)
                if end_f is not None:
                    tot_files = (tot_files or 0) + int(end_f)
            cfs_disp[cf]["Sum"] = _growth_str(tot_start, tot_end, tot_files)
        d["CF-s Growth"] = cfs_disp
    return d


# ---- flushes section

def _cf_flushes_stats(view: View, cf):
    """calc_utils.calc_cf_flushes_stats."""
    pairs = flush_flow_pairs(view, cf)
    if not pairs:
        return {}
    stats = {}
    for start, end in pairs:
        reason = start["p"].get("flush_reason")
        num_memtables = int(start["p"].get("num_memtables") or 0)
        size = int(start["p"].get("total_data_size") or 0)
        duration = 0
        if end is not None:
            duration = int((end["micros"] - start["micros"]) / 1000)
        bucket = bisect(FLUSH_BUCKETS_MB, size / 2 ** 20)
        s = stats.setdefault(reason, {
            "n": 0, "hist": [0] * (len(FLUSH_BUCKETS_MB) + 1),
            "min_dur": None, "max_dur": None, "min_mem": None,
            "max_mem": None, "min_size": None, "max_size": None})
        s["n"] += 1
        s["hist"][bucket] += 1

        def mn(c, v):
            return min(c, v) if c is not None else v

        def mx(c, v):
            return max(c, v) if c is not None else v
        s["min_dur"] = mn(s["min_dur"], duration)
        s["max_dur"] = mx(s["max_dur"], duration)
        s["min_mem"] = mn(s["min_mem"], num_memtables)
        s["max_mem"] = mx(s["max_mem"], num_memtables)
        s["min_size"] = mn(s["min_size"], size)
        s["max_size"] = mx(s["max_size"], size)
    return stats


def _sizes_histogram_disp(hist):
    out = {}
    lo = 0
    for i, n in enumerate(hist):
        if i < len(FLUSH_BUCKETS_MB):
            hi = FLUSH_BUCKETS_MB[i]
            out[f"{lo} - {hi} [MB]"] = n
            lo = hi
        else:
            out[f"> {lo} [MB]"] = n
    return out


def _flushes_section(view: View, cfs_names):
    disp = {}
    for cf in cfs_names:
        stats = _cf_flushes_stats(view, cf)
        if not stats:
            continue
        cf_disp = {}
        entries = view.cf_comp_entries(cf)
        wa = None
        if entries:
            wa_levels = View.levels_field(entries[-1][1], "W-Amp")
            if wa_levels and 1 in wa_levels:
                wa = wa_levels[1]
        cf_disp["L0->L1 Write-Amp"] = wa if wa else DATA_UNAVAILABLE
        for reason, s in stats.items():
            cf_disp[reason] = {
                "Sizes Histogram": _sizes_histogram_disp(s["hist"]),
                "Num Flushes": human_num(s["n"]),
                "Min Duration": format_value(s["min_dur"], suffix="ms"),
                "Max Duration": format_value(s["max_dur"], suffix="ms"),
                "Min Num Memtables": format_value(s["min_mem"]),
                "Max Num Memtables": format_value(s["max_mem"]),
                "Min Total Data Size": format_value(
                    s["min_size"], conv_func=human_bytes),
                "Max Total Data Size": format_value(
                    s["max_size"], conv_func=human_bytes),
            }
        disp[cf] = cf_disp
    if not disp:
        return "No Flushes"
    return {"CF-s": {cf: disp[cf] for cf in cfs_names if cf in disp}}


# ---- compactions section

def _compaction_jobs(view: View, cf):
    """Finished compaction jobs w/ pre-finish stats: start/finish pairs
    per job + first-match-in-order pre-finish lines on
    (cf, records_in == num_input_records) (compactions.py:204-219)."""
    starts = {e["job_id"]: e
              for e in view.events_of_type(cf, "compaction_started")}
    finishes = [e for e in view.events_of_type(cf, "compaction_finished")
                if e["job_id"] in starts]
    pre = [dict(r) for r in view.by_kind.get("prefinish", [])
           if r["cf"] == cf]
    for p in pre:
        p["_used"] = False
    jobs = []
    for f in finishes:
        records_in = f["p"].get("num_input_records")
        match = None
        for p in pre:
            if not p["_used"] and \
                    int(p["attrs"].get("records_in") or -1) == records_in:
                p["_used"] = True
                match = p
                break
        jobs.append({"start": starts[f["job_id"]], "finish": f,
                     "pre": match})
    return jobs


def _compactions_section(view: View, cfs_names):
    per_cf = {}
    for cf in cfs_names:
        jobs = _compaction_jobs(view, cf)
        if not jobs:
            continue
        min_bw = max_bw = None
        for j in jobs:
            if j["pre"] is not None:
                bw = float(j["pre"]["attrs"]["write_rate_mbps"])
                min_bw = bw if min_bw is None else min(min_bw, bw)
                max_bw = bw if max_bw is None else max(max_bw, bw)
        s = {"Num Compactions": len(jobs),
             "Min Compactions BW": format_value(min_bw, "MBPS"),
             "Max Compactions BW": format_value(max_bw, "MBPS")}

        comp_sec = comp_cpu = None
        per_level_wa = "No Write-Amp Info Found"
        entries = view.cf_comp_entries(cf)
        if entries:
            last_t, last = entries[-1]
            wa = View.levels_field(last, "W-Amp")
            if wa:
                wa = {str(k): v for k, v in sorted(wa.items())}
                wa["SUM"] = View.sum_field(last, "W-Amp")
                per_level_wa = wa
            start_time = view.meta.get("start_time")
            if start_time and time_diff_seconds(start_time, last_t) > 0:
                cs = View.sum_field(last, "Comp(sec)")
                cc = View.sum_field(last, "CompMergeCPU(sec)")
                comp_sec = float(cs) if cs is not None else None
                comp_cpu = float(cc) if cc is not None else None
        s["Comp"] = format_value(comp_sec, "seconds")
        s["Comp Merge CPU"] = format_value(comp_cpu, "seconds")
        s["Per-Level Write-Amp"] = per_level_wa
        per_cf[cf] = s

    if not per_cf:
        return "No Compactions"
    largest = 0
    for e in view.events:
        if e["type"] == "compaction_started":
            largest = max(largest, int(e["p"].get("input_data_size") or 0))
    return {"Largest compaction size": human_bytes(largest),
            "CF-s": {cf: per_cf[cf] for cf in cfs_names if cf in per_cf}}


# ---- reads / seeks sections

def _histogram_disp(entry):
    """CountersMngr.get_histogram_entry_display_values."""
    v = entry["values"]
    return {"Count": human_num(v["Count"]), "Sum": human_num(v["Sum"]),
            "Avg. Read Latency": f"{v['Average']:.1f} us",
            "P50": f"{v['P50']:.1f} us", "P95": f"{v['P95']:.1f} us",
            "P99": f"{v['P99']:.1f} us", "P100": f"{v['P100']:.1f} us"}


def _reads_section(view: View, cfs_names):
    stats = {}
    get = view.last_histogram_entry("rocksdb.db.get.micros", non_zero=True)
    stats["Get Histogram"] = _histogram_disp(get) if get else "No Get Info"
    mget = view.last_histogram_entry("rocksdb.db.multiget.micros",
                                     non_zero=True)
    stats["Multi-Get Histogram"] = _histogram_disp(mget) if mget \
        else "No Multi-Get Info"

    # per-cf read latency (calc_utils.calc_read_latency_per_cf_stats)
    per_cf = {}
    total_reads = 0
    for cf, entries in view.read_latency.items():
        last_time = list(entries)[-1]
        levels = entries[last_time]
        n = sum(s["count"] for s in levels.values())
        if n == 0:
            continue
        lat = sum(s["count"] * s["average"] for s in levels.values())
        mx = max(s["max"] for s in levels.values())
        per_cf[cf] = {"n": n, "avg": lat / n, "max": mx}
        total_reads += n
    disp = {}
    for cf, s in per_cf.items():
        disp[cf] = {
            "Num Reads": human_num(s["n"]),
            "Avg. Read Latency": f"{s['avg']:.1f} us",
            "Max Read Latency": f"{s['max']:.1f} us",
            "Read % of All CF-s": f"{s['n'] / total_reads * 100:.1f}%",
        }
    stats["Per CF Read Latency"] = disp

    # filter effectiveness (display_utils + calc_utils.calc_filter_stats)
    files_filter = calc_files_filter_stats(view, cfs_names)
    fe = {}
    if files_filter:
        fe["CF-s"] = {cf: _cf_filter_disp(s, as_dict=True)
                      for cf, s in files_filter.items()}
    else:
        fe["CF-s"] = "No Filters used In SST-s"
    counters = None
    if view.has_counters():
        neg = view.last_counter_value("rocksdb.bloom.filter.useful")
        pos = view.last_counter_value("rocksdb.bloom.filter.full.positive")
        tp = view.last_counter_value(
            "rocksdb.bloom.filter.full.true.positive")
        fp = pos - tp
        one_in_n = int((neg + pos) / fp) if fp else 0
        counters = {"neg": neg, "pos": pos, "tp": tp, "fp": fp,
                    "one_in_n": one_in_n}
    if counters and (counters["neg"] + counters["pos"] + counters["tp"]
                     + counters["fp"] + counters["one_in_n"]) != 0:
        fe["Counters"] = {
            "False-Positive-Rate": f"1 in {counters['one_in_n']}",
            "False-Positives": human_num(counters["fp"]),
            "Negatives": human_num(counters["neg"]),
            "True-Positives": human_num(counters["tp"]),
        }
    else:
        fe["Counters"] = "No Filter Counters Available"
    stats["Filter Effectiveness"] = fe
    return stats


def _seeks_section(view: View):
    """calc_utils.get_applicable_seek_stats +
    display_utils.prepare_seek_stats_for_display."""
    last = view.last_counter_entry("rocksdb.number.db.seek")
    if not last:
        return "No Seeks"
    first = view.first_counter_entry("rocksdb.number.db.seek")
    num_seeks = last["value"] - first["value"]
    if num_seeks == 0:
        return "No Seeks"
    span = time_diff_seconds(first["time"], last["time"])
    found = view.last_counter_value("rocksdb.number.db.seek.found") - \
        view.first_counter_value("rocksdb.number.db.seek.found")
    nexts = view.last_counter_value("rocksdb.number.db.next") - \
        view.first_counter_value("rocksdb.number.db.next")
    prevs = view.last_counter_value("rocksdb.number.db.prev") - \
        view.first_counter_value("rocksdb.number.db.prev")
    avg_range = (prevs + nexts) / num_seeks if num_seeks > 0 else 0.0
    rate = 0.0
    latency = 0.0
    hist = view.last_histogram_entry("rocksdb.db.seek.micros", non_zero=True)
    if hist:
        if span > 0.0:
            rate = num_seeks / span
        latency = hist["values"]["Average"]
    return {"Num Seeks": human_num(num_seeks),
            "Num Found Seeks": human_num(found),
            "Num Nexts": human_num(nexts),
            "Num Prevs": human_num(prevs),
            "Avg. Seek Range Size": f"{avg_range:.1f}",
            "Avg. Seeks Rate Per Second": human_num(rate),
            "Avg. Seek Latency": f"{latency:.1f} us"}


# ---- warnings section

def _warnings_section(warnings_all, cfs_names):
    warns = warnings_all.get("WARN")
    if not warns:
        return "No Warnings"
    info = {}
    for cf in [NO_CF] + cfs_names:
        if cf in warns:
            info[cf] = {cat: len(v) for cat, v in warns[cf].items()}
        else:
            info[cf] = {}
    disp_db, disp_cfs = {}, {}
    for cf, cats in info.items():
        if cf == NO_CF:
            disp_db.update(cats)
        else:
            disp_cfs[cf] = dict(cats)
    out = {"DB": disp_db if disp_db else "No DB Warnings",
           "CF-s": disp_cfs if disp_cfs else "No CF-s Warnings"}
    return out


# ---- block cache section

def _block_cache_section(view: View):
    """cache_utils.calc_block_cache_stats +
    display_utils.prepare_block_cache_stats_for_display."""
    cache_options = {}
    for cf in view.option_cfs_names():
        san_ptr = sanitize_value(view.get_cf_table_option(
            cf, "block_cache"))[0] if view.get_cf_table_option(
            cf, "block_cache") is not None else None
        raw_ptr = sanitized_to_raw_ptr(san_ptr) if san_ptr else None
        if raw_ptr is None or raw_ptr == RAW_NULL_PTR:
            continue
        cache_name = view.get_cf_table_option(cf, "block_cache_name")
        caf = view.get_cf_table_option(cf, "cache_index_and_filter_blocks")
        cap = view.get_cf_table_option(cf, "block_cache_capacity")
        shard_bits = view.get_cf_table_option(
            cf, "block_cache_num_shard_bits")
        if cache_name is None or caf is None or cap is None or \
                shard_bits is None:
            continue
        cache_id = f"{cache_name}@{raw_ptr}"
        e = cache_options.setdefault(cache_id, {
            "capacity": int(cap), "shard_bits": int(shard_bits),
            "cfs": {}})
        e["cfs"][cf] = {"cache_index_and_filter_blocks": caf}

    if not cache_options:
        return "No Block Cache Statistics"

    caches_disp = {}
    for cache_id, opt in cache_options.items():
        files_stats = calc_cf_files_stats(view, list(opt["cfs"]))
        if not files_stats:
            return "No Block Cache Statistics"
        num_shards = 2 ** opt["shard_bits"]
        shard_size = int((opt["capacity"] + num_shards - 1) / num_shards)
        disp = {"Capacity": human_bytes(opt["capacity"]),
                "Num Shards": num_shards,
                "Shard Size": human_bytes(shard_size),
                "CF-s": opt["cfs"]}
        idx = files_stats["blocks"]["INDEX"]
        disp["Index Block"] = {
            "Total Size": human_bytes(idx.curr_live if idx else 0),
            "Avg. Size": human_bytes(int(idx.avg() if idx else 0)),
            "Max Size": human_bytes(idx.largest if idx else 0),
            "Max Size At": idx.largest_time if idx else None,
        }
        flt = files_stats["blocks"]["FILTER"]
        if flt and flt.num_created > 0:
            disp["Filter Block"] = {
                "Total Size": human_bytes(flt.curr_live),
                "Avg. Size": human_bytes(int(flt.avg())),
                "Max Size": human_bytes(flt.largest),
                "Max Size At": flt.largest_time,
            }
        else:
            disp["Filter Block"] = "No Stats (Filters not in use)"
        caches_disp[cache_id] = disp

    out = {"Caches": caches_disp}

    if view.has_counters():
        names = {
            "cache_add": "rocksdb.block.cache.add",
            "cache_miss": "rocksdb.block.cache.miss",
            "cache_hit": "rocksdb.block.cache.hit",
            "index_add": "rocksdb.block.cache.index.add",
            "index_miss": "rocksdb.block.cache.index.miss",
            "index_hit": "rocksdb.block.cache.index.hit",
            "filter_add": "rocksdb.block.cache.filter.add",
            "filter_miss": "rocksdb.block.cache.filter.miss",
            "filter_hit": "rocksdb.block.cache.filter.hit",
            "data_add": "rocksdb.block.cache.data.add",
            "data_miss": "rocksdb.block.cache.data.miss",
            "data_hit": "rocksdb.block.cache.data.hit"}
        out["DB Counters"] = {
            k: human_num(view.last_counter_value(n))
            for k, n in names.items()}
    else:
        out["DB Counters"] = "No Counters Dumps Available"

    # detailed (stats dump entries, humanized)
    if view.caches:
        detailed = {}
        for cache_id, cache in view.caches.items():
            e = {"Capacity": human_bytes(cache["Capacity"]),
                 "Usage": human_bytes(cache["Usage"])}
            for key, entry in cache.items():
                if key in ("Capacity", "Usage"):
                    continue
                t_entry = {"Usage": human_bytes(entry["Usage"])}
                for k2, v2 in entry.items():
                    if k2 == "Usage":
                        continue
                    if k2 == "CF-s":
                        t_entry["CF-s"] = {
                            cf: {role: human_bytes(sz)
                                 for role, sz in roles.items()}
                            for cf, roles in v2.items()}
                    else:
                        t_entry[k2] = {"Count": v2["Count"],
                                       "Size": human_bytes(v2["Size"]),
                                       "Portion": v2["Portion"]}
                e[key] = t_entry
            detailed[cache_id] = e
        out["Detailed"] = detailed
    else:
        out["Detailed"] = "No Detailed Block Cache Stats Available"

    return out


# --------------------------------------------------------------- baseline

def find_baseline(product_name, version, folder=None):
    """Closest-version vendored baseline as {path, version, options}
    (baseline_log_files_utils.py:78-163 via our options_diff)."""
    from log_parser_spark.engine import options_diff as od
    folder = folder or od.BASELINE_LOGS_DIR
    if not product_name or not version:
        return None
    low = product_name.lower()
    if low not in ("rocksdb", "speedb"):
        return None
    hit = od.closest_baseline(low.upper(), version, folder)
    if hit is None:
        return None
    _prod, bversion, path = hit
    rows = []
    from log_parser_spark.parsing import parse_document
    with open(path) as f:
        recs = parse_document(f.read())
    options = {}
    for r in recs:
        if r["kind"] == "option" and "." not in r["name"]:
            options[f"{_SECTION_PREFIX[r['attrs']['section']]}.{r['name']}"] \
                = sanitize_value(r["msg"])[0]
    del rows
    return {"path": path, "version": bversion, "options": options}


def baseline_from_options_rows(rows, product_name, version, folder):
    """Same as find_baseline but over pre-parsed baseline option rows
    [(product, bversion, section, cf, option, value)] — used by the
    distributed sink so workers don't re-parse baseline logs."""
    from log_parser_spark.engine import options_diff as od
    if not product_name or not version:
        return None
    low = product_name.lower()
    if low not in ("rocksdb", "speedb"):
        return None
    prod = low.upper()
    versions = sorted({r[1] for r in rows if r[0] == prod},
                      key=od._version_key)
    chosen = None
    key = od._version_key(version)
    for v in versions:
        if od._version_key(v) <= key:
            chosen = v
        else:
            break
    if chosen is None:
        return None
    options = {}
    for r in rows:
        if r[0] == prod and r[1] == chosen and "." not in r[4]:
            options[f"{_SECTION_PREFIX[r[2]]}.{r[4]}"] = \
                sanitize_value(r[5])[0]
    path = f"{folder}/LOG-{low}-{chosen}"
    return {"path": path, "version": chosen, "options": options}


# --------------------------------------------------------------- top level

def render_parsed_json(name, records, baseline="auto"):
    """json_outputter.get_json shape for one document.

    name:      the report's display name (reference: log file path;
               pipeline: the url)
    records:   this document's parsed records as dicts (attrs as dict),
               in seq order
    baseline:  "auto" resolves the closest vendored baseline from the
               document's product/version; or a prepared baseline dict /
               None
    """
    view = View(records)
    cfs_names = view.cfs_names()
    warnings_all = _processed_warnings(view, cfs_names)

    if baseline == "auto":
        baseline = find_baseline(view.meta.get("product_name"),
                                 view.meta.get("version"))

    j = {}
    j["General"] = _general_section(view, name, warnings_all)
    j["Options"] = _options_section(view, baseline)
    j["DB-Size"] = _db_size_section(view, cfs_names)
    j["Flushes"] = _flushes_section(view, cfs_names)
    j["Compactions"] = _compactions_section(view, cfs_names)
    j["Reads"] = _reads_section(view, cfs_names)
    j["Seeks"] = _seeks_section(view)
    j["Warnings"] = _warnings_section(warnings_all, cfs_names)
    j["Block-Cache-Stats"] = _block_cache_section(view)
    j["Memory-Reporting"] = _mem_rep_section(view)
    return j


def _ascii_table(columns, rows):
    """display_utils.generate_ascii_table, byte-exact (centered cells,
    dash borders; returns None for an empty table like the reference)."""
    import io
    f = io.StringIO()
    if len(rows) < 1:
        return None
    widths = [2 + max(max(len(str(r[i])) for r in rows), len(columns[i]))
              for i in range(len(columns))]
    header = "".join(f"|{name.center(w)}" for name, w in
                     zip(columns, widths)) + "|"
    print("-" * len(header), file=f)
    print(header, file=f)
    print("-" * len(header), file=f)
    for r in rows:
        print("".join(f"|{str(v).center(w)}" for v, w in
                      zip(r, widths)) + "|", file=f)
    print("-" * len(header), file=f)
    return f.getvalue()


def render_console_short(name, records):
    """S10: the reference's SHORT console printout, byte-exact
    (console_outputter.py:24-146): title, the db-wide info block with
    footnote suffixes, the per-CF ascii table, and the footnotes."""
    import io
    view = View(records)
    warnings_all = _processed_warnings(view, view.cfs_names())
    disp = dict(_db_wide_info(view, name, warnings_all))

    f = io.StringIO()
    title = f"Parsing of: {name}"
    print(title, file=f)
    print(len(title) * "=", file=f)

    for key in ("Error Messages", "Fatal Messages"):
        if isinstance(disp[key], dict):
            disp[key] = "".join(f"\n{t} {msg}"
                                for t, msg in disp[key].items())

    def rename(d, old, new):
        return {(new if k == old else k): v for k, v in d.items()}

    suffix = ""
    msg1 = msg2 = msg3 = None
    db_size_msg_suffix = None
    db_size_time = disp["DB Size Time"]
    if db_size_time is not None:
        suffix += "*"
        db_size_msg_suffix = suffix
        disp = rename(disp, "DB Size", f"DB Size ({suffix})")
        msg1 = f"({suffix}) Data is calculated at: {db_size_time}"
    del disp["DB Size Time"]

    ingest_time = disp["Ingest Time"]
    if ingest_time is not None:
        if db_size_time != ingest_time:
            suffix += "*"
            msg2 = f"({suffix}) Ingest Data are calculated at: {ingest_time}"
        disp = rename(disp, "Ingest", f"Ingest ({suffix})")
    del disp["Ingest Time"]

    if "Num CF-s Info" in disp:
        suffix += "*"
        disp = rename(disp, "Num CF-s", f"Num CF-s ({suffix})")
        msg3 = f"({suffix}) {disp['Num CF-s Info']}"
        del disp["Num CF-s Info"]

    for field_name, value in disp.items():
        print(f"{field_name.ljust(25)}: {value}", file=f)

    cfs_disp = _general_cfs_section(view, view.cfs_names())
    rows = [[cf, i["CF Size"], i["Avg. Key Size"], i["Avg. Value Size"],
             i["Compaction Style"], i["Compression"], i["Filter-Policy"]]
            for cf, i in cfs_disp.items()]
    size_suffix = f"({db_size_msg_suffix})" if db_size_msg_suffix \
        is not None else ""
    header = ["Column Family", f"Size {size_suffix}", "Avg. Key Size",
              "Avg. Value Size", "Compaction Style", "Compression",
              "Filter-Policy"]
    print(_ascii_table(header, rows), file=f)

    for m in (msg1, msg2, msg3):
        if m is not None:
            print(m, file=f)
    return f.getvalue()


def _mem_rep_section(view: View):
    """display_utils.prepare_mem_reps_for_display: per report time, the
    arena stats (zero-usage entities dropped), cf stats, and misc."""
    if not view.mem_reps:
        return "No Memory Reports"
    disp = {}
    for time, rep in view.mem_reps.items():
        disp[time] = {
            "Arena": {"Total": rep["arena_total"],
                      "Entities": {k: v for k, v in rep["arena"].items()
                                   if v != "0"}},
            "CF-s": {"Total": rep["cfs_total"], "CF-s": dict(rep["cfs"])},
            "Misc": dict(rep["misc"]),
        }
    return disp
