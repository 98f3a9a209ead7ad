"""Per-document parse state machine: one whole LOG text -> typed records.

This is the single place where sequential, order-sensitive state lives
(dispatch order, preamble consumption, options-section boundaries, the
DUMPING-STATS carry-over flag, counter monotonicity) — exactly the state
scope of the reference's ``ParsedLog`` (log_file.py:158-200), so running
it per document under ``mapInPandas`` is embarrassingly parallel across
urls with *exact* semantics.

Dispatch order is normative (log_file.py:458-502):
  cf-lifetime -> db-wide options -> cf options -> warnings -> events ->
  stats dumps -> counters -> mem-rep -> compaction monitors -> unparsed.

Every record is a flat dict matching ``log_parser_spark.engine.schema``.
"""

from __future__ import annotations

import json

from log_parser_spark import grammar as g
from log_parser_spark.parsing.entries import (Entry, is_entry_start,
                                              segment_lines,
                                              segment_text_lazy)

NO_CF = g.NO_CF

# ---------------------------------------------------------------- records


class DocAbort(Exception):
    """Mirrors an uncaught AssertionError in the reference parse
    (log_file.py:500-502): the whole document yields no outputs."""


def _rec(kind, **kw):
    r = {
        "seq": 0,
        "entry_idx": None,
        "line_idx": None,
        "ts": None,
        "kind": kind,
        "warn_type": None,
        "code_pos": None,
        "cf": None,
        "job_id": None,
        "name": None,
        "value": None,
        "event_type": None,
        "time_micros": None,
        "payload_json": None,
        "attrs": None,
        "msg": None,
    }
    r.update(kw)
    return r


# ------------------------------------------------------- small helpers

_BYTES_UNITS = ["KB", "MB", "GB", "TB"]
_NUM_UNITS = ["K", "M", "G"]


def _from_human(value_str: str, unit_str: str, units, factor) -> int:
    # utils.py:478-507 semantics
    v = float(value_str)
    unit_str = (unit_str or "").strip()
    if unit_str:
        mult = factor ** (units.index(unit_str) + 1)
    else:
        mult = 1
    return int(v * mult)


def human_bytes_to_int(value_str: str, unit_str: str) -> int:
    return _from_human(value_str, unit_str, _BYTES_UNITS, 1024)


def human_num_to_int(value_str: str, unit_str: str) -> int:
    return _from_human(value_str, unit_str, _NUM_UNITS, 1000)


def _is_options_entry(entry: Entry):
    # log_file_options_parser.py:41-60 — exactly one OPTION_LINE match
    # in msg.  OPTION_LINE requires the literal "Options." — the
    # substring gate skips the full-msg findall scan on the vast
    # majority of entries (this probe runs once per entry per dispatch
    # attempt, the hottest regex in the parse).
    msg = entry.get_msg()
    if "Options." not in msg:
        return None
    m = _OPTION_LINE_RE.findall(msg)
    if len(m) != 1 or len(m[0]) != 2:
        return None
    return m[0][0].strip(), m[0][1].strip()


_OPTION_LINE_RE = g.compiled(g.OPTION_LINE)
_CF_OPTIONS_START_RE = g.compiled(g.CF_OPTIONS_START)
_SUPPORT_INFO_RE = g.compiled(g.SUPPORT_INFO_START_LINE)
_EVENT_RE = g.compiled(g.EVENT)
_FLUSH_PRE_RE = g.compiled(g.FLUSH_EVENT_PREAMBLE)
_COMP_PRE_RE = g.compiled(g.COMPACTION_EVENT_PREAMBLE)
_DROP_CF_RE = g.compiled(g.DROP_CF)
_RECOVERED_CF_RE = g.compiled(g.RECOVERED_CF)
_CREATE_CF_RE = g.compiled(g.CREATE_CF)
_CF_STATS_RE = g.compiled(g.CF_STATS)
_DB_STATS_RE = g.compiled(g.DB_STATS)
_STATS_HDR_RE = g.compiled(g.STATS_COUNTERS_AND_HISTOGRAMS)
_COUNTER_RE = g.compiled(g.STATS_COUNTER)
_HIST_RE = g.compiled(g.STATS_HISTOGRAM)
_MEM_TITLE_RE = g.compiled(g.MEM_REP_TITLE)
_PREFINISH_RE = g.compiled(g.COMPACTION_JOB_FINISH_STATS_LINE)

_TABLE_TOPICS = [
    ("metadata_cache_options", "metadata_cache_"),
    ("block_cache_options", "block_cache_"),
    ("pinning_policy_options", "pinning_policy_"),
]


def _try_parse_table_options(entry: Entry):
    # log_file_options_parser.py:63-140
    lines = entry.msg_lines
    if len(lines) < 1:
        return None
    m = g.compiled(g.TABLE_OPTIONS_START_LINE).findall(lines[0])
    if len(m) != 1 or len(m[0]) != 2:
        return None
    d = {m[0][0].strip(): m[0][1].strip()}
    cont = g.compiled(g.TABLE_OPTIONS_CONTINUATION_LINE)

    def parse_line(line):
        mm = cont.findall(line)
        if not mm:
            return None, None
        return mm[0][0].strip(), mm[0][1].strip()

    rest = lines[1:]
    i = 0
    while i < len(rest):
        name, val = parse_line(rest[i])
        if name is None:
            i += 1
            continue
        topic = next((t for t in _TABLE_TOPICS if t[0] == name), None)
        if topic is None:
            d[name] = val
            i += 1
        else:
            indent = len(rest[i]) - len(rest[i].lstrip())
            i += 1
            while i < len(rest):
                line = rest[i]
                if len(line) - len(line.lstrip()) <= indent:
                    break
                nm, vl = parse_line(line)
                if nm is None:
                    break
                d[f"{topic[1]}{nm}"] = vl
                i += 1
    return d


# ------------------------------------------------------------ the parser


class DocumentParser:
    """Parses one log document; collects records in self.records."""

    def __init__(self, text: str):
        self.text = text
        self.records: list[dict] = []
        self.seq = 0

        self.db_wide_options_set = False
        self.next_unknown_cf_suffix: int | None = None
        self.dump_stats_entry_found = False
        self.preambles: dict[int, dict] = {}
        # job_id -> {cf_name: set(event_types)} for db-wide attribution
        self.job_events: dict[int, dict[str, set]] = {}
        self.counter_last: dict[str, int] = {}
        self.hist_last: dict[str, tuple[int, int]] = {}
        self.cfs_seen: dict[str, dict] = {}  # registry (order preserved)
        # comp-stats tables keyed (ts, cf): a re-dump at the same time for
        # the same cf REPLACES the previous table, like the reference's
        # level_entries[time][cf] dict (stats_mngr.py:396-399); emitted
        # after the dispatch loop in dict order
        self.comp_entries: dict[tuple, list] = {}
        self.entries: list[Entry] = []
        self.entry_idx = 0

    # -- emit helpers ----------------------------------------------------
    def emit(self, kind, entry: Entry | None = None, **kw):
        r = _rec(kind, **kw)
        if entry is not None:
            if r["ts"] is None:
                r["ts"] = entry.time
            if r["line_idx"] is None:
                r["line_idx"] = entry.start_line_idx
            r["entry_idx"] = self.entry_idx
        r["seq"] = self.seq
        self.seq += 1
        self.records.append(r)
        return r

    def add_cf_found(self, cf_name, entry: Entry, discovery: str,
                     has_options=False, auto_generated=False, cf_id=None):
        # cfs_infos.py:66-94 — first discovery wins
        if cf_name is None or cf_name in self.cfs_seen:
            return
        self.cfs_seen[cf_name] = {"discovery": discovery}
        self.emit(
            "cf_found", entry, cf=cf_name, name=discovery,
            attrs={
                "has_options": str(has_options),
                "auto_generated": str(auto_generated),
                **({"cf_id": str(cf_id)} if cf_id is not None else {}),
            },
        )

    # Hard cap ~ the Arrow/parquet utf-8 CELL ceiling: a document that
    # can't even be one table cell can't reach the parser at all.  (The
    # reference loads whole files with no cap, log_parser.py:68-74.)
    MAX_DOC_BYTES = 1_900_000_000
    # Beyond this, entry segmentation goes lazy (offsets over the raw
    # text instead of a lines list + Entry objects) so peak parse memory
    # stays ~1x the text; below it the eager path is faster.  Compared
    # against len(text) (chars) — a perf threshold, not a cap, so the
    # char-count proxy is fine.
    LAZY_DOC_BYTES = 64 * 1024 * 1024

    # -- top-level driver -------------------------------------------------
    def _prepare(self) -> dict | None:
        """Segment + emit the job->cf map; returns a quarantine record
        when the document can't be parsed at all."""
        # MAX_DOC_BYTES is byte-denominated; len(text) counts chars.
        # chars*4 bounds the utf-8 size, so only docs above MAX/4 chars
        # need the exact byte count (isascii() dodges the encode for
        # the common all-ascii giant log).
        if len(self.text) > self.MAX_DOC_BYTES // 4:
            n_bytes = len(self.text) if self.text.isascii() else \
                len(self.text.encode("utf-8", "surrogatepass"))
            if n_bytes > self.MAX_DOC_BYTES:
                return _rec("quarantine",
                            attrs={"reason": "oversized_document",
                                   "n_bytes": str(n_bytes)})
        first_nl = self.text.find("\n")
        first_line = self.text[:first_nl if first_nl != -1 else None]
        if not self.text:
            return _rec("quarantine", attrs={"reason": "empty_log"})
        if not is_entry_start(first_line):
            return _rec("quarantine", attrs={"reason": "invalid_log"})

        if len(self.text) > self.LAZY_DOC_BYTES:
            self.entries, job_map = segment_text_lazy(self.text)
        else:
            lines = self.text.split("\n")
            if lines and lines[-1] == "":
                lines = lines[:-1]
            self.entries, job_map = segment_lines(lines)
        if not len(self.entries):
            return _rec("quarantine", attrs={"reason": "invalid_log"})

        for job_id, cf in job_map.items():
            self.emit("job_cf", name=str(job_id), job_id=job_id, cf=cf)
        return None

    def _flush_comp_entries(self):
        for (ts, cf_name), rows in self.comp_entries.items():
            for key, row, line_idx in rows:
                # payload_json preserves column order (Spark maps do not)
                self.emit("comp_stats", ts=ts, cf=cf_name, name=key,
                          line_idx=line_idx, attrs=row,
                          payload_json=json.dumps(row))
        self.comp_entries = {}

    def run(self) -> list[dict]:
        q = self._prepare()
        if q is not None:
            return [q]
        try:
            if not self.parse_metadata():
                return [_rec("quarantine",
                             attrs={"reason": "invalid_metadata"})]
            self.parse_rest()
        except DocAbort as e:
            return [_rec("quarantine", attrs={"reason": f"parse_abort:{e}"})]

        self._flush_comp_entries()
        return self.records

    def run_stream(self, flush_every: int = 200_000):
        """Generator variant of run(): yields record batches every
        ``flush_every`` records so an oversized document's output never
        accumulates in one list (the mapInPandas wrapper forwards each
        batch as its own Arrow frame).  Record content and order are
        identical to run()."""
        q = self._prepare()
        if q is not None:
            yield [q]
            return
        try:
            if not self.parse_metadata():
                yield [_rec("quarantine", attrs={"reason":
                                                 "invalid_metadata"})]
                return
            while self.entry_idx < len(self.entries):
                self._parse_step()
                if len(self.records) >= flush_every:
                    out, self.records = self.records, []
                    yield out
        except DocAbort as e:
            # Already-yielded batches can't be retracted from a stream;
            # run() would discard them.  Deviation (oversized docs only):
            # keep the partial output and mark the quarantine record, so
            # downstream can drop the url's records if it must.
            self.records = []
            yield [_rec("quarantine",
                        attrs={"reason": f"parse_abort:{e}",
                               "partial_output": "True"})]
            return

        self._flush_comp_entries()
        if self.records:
            yield self.records

    # -- metadata (log_file.py:36-156,281-293) ----------------------------
    def parse_metadata(self) -> bool:
        idx = 0
        while idx < len(self.entries) and _is_options_entry(self.entries[idx]) is None:
            idx += 1

        meta_entries = self.entries[:idx]
        product = version = git_hash = session = None
        for e in meta_entries:
            first = (e.msg_lines[0] if e.msg_lines else "").strip()
            m = g.compiled(g.PRODUCT_AND_VERSION).findall(first)
            if len(m) == 1:
                if product or version:
                    raise DocAbort("duplicate product/version")
                product, version = m[0]
                continue
            m = g.compiled(g.GIT_HASH_LINE).findall(first)
            if len(m) == 1:
                if git_hash:
                    raise DocAbort("duplicate git hash")
                git_hash = m[0]
                continue
            m = g.compiled(g.DB_SESSION_ID).findall(first)
            if len(m) == 1:
                if session:
                    raise DocAbort("duplicate db session id")
                session = m[0]

        if not product or not version:
            return False

        start_time = self.entries[0].time
        end_time = self.entries[-1].time
        for name, sval in [
            ("product_name", product), ("version", version),
            ("git_hash", git_hash), ("db_session_id", session),
            ("start_time", start_time), ("end_time", end_time),
        ]:
            if sval is not None:
                self.emit("metadata", self.entries[0], name=name, msg=sval)

        self.entry_idx = idx
        return True

    # -- dispatch loop (log_file.py:458-502) -------------------------------
    def parse_rest(self):
        while self.entry_idx < len(self.entries):
            self._parse_step()

    def _parse_step(self):
        """Dispatch one entry (or one recognized entry group)."""
        start_idx = self.entry_idx
        try:
            if self.try_cf_lifetime():
                return
            if self.try_db_wide_options():
                return
            if self.try_cf_options():
                return
            if self.try_warning():
                return
            if self.try_event():
                return
            if self.try_stats():
                return
            if self.try_counters():
                return
            if self.try_mem_rep():
                return
            if not self.try_monitors():
                e = self.cur()
                self.emit("unparsed", e, msg=e.get_msg())
            self.entry_idx += 1
        except DocAbort:
            raise
        except Exception:
            # best-effort recovery (log_file.py:493-498)
            if self.entry_idx == start_idx:
                self.entry_idx += 1

    def cur(self) -> Entry:
        return self.entries[self.entry_idx]

    # -- cf lifetime (cfs_infos.py:96-186) ---------------------------------
    def try_cf_lifetime(self) -> bool:
        e = self.cur()
        msg = e.get_msg()

        m = _DROP_CF_RE.findall(msg)
        if m:
            self.emit("cf_lifetime", e, name="drop", attrs={"cf_id": m[0]})
            self.entry_idx += 1
            return True

        m = _RECOVERED_CF_RE.search(msg)
        if m:
            cf = m.group("cf")
            self.emit("cf_lifetime", e, name="recover", cf=cf,
                      attrs={"cf_id": m.group("cf_id"),
                             "log_num": m.group("log_num")})
            self.add_cf_found(cf, e, "recovered", cf_id=int(m.group("cf_id")))
            self.entry_idx += 1
            return True

        m = _CREATE_CF_RE.search(msg)
        if m:
            cf = m.group("cf")
            self.emit("cf_lifetime", e, name="create", cf=cf,
                      attrs={"cf_id": m.group("cf_id")})
            self.add_cf_found(cf, e, "created", cf_id=int(m.group("cf_id")))
            self.entry_idx += 1
            return True

        return False

    # -- db-wide options (log_file.py:349-371, options parser 157-201) -----
    def try_db_wide_options(self) -> bool:
        if self.db_wide_options_set:
            return False
        e = self.cur()
        if _is_options_entry(e) is None:
            return False

        # find the support-info sentinel (log_file.py:328-338)
        sup_idx = self.entry_idx
        sentinel = _SUPPORT_INFO_RE
        while sup_idx < len(self.entries):
            first = self.entries[sup_idx].get_msg_lines()[0] \
                if self.entries[sup_idx].msg_lines else ""
            if sentinel.findall(first):
                break
            sup_idx += 1
        if sup_idx >= len(self.entries):
            raise ValueError("no support info sentinel")  # entry skipped

        wbm_re = g.compiled(g.DB_WIDE_WBM_PSEUDO_OPTION_LINE)
        emitted = False
        for i in range(self.entry_idx, sup_idx):
            ent = self.entries[i]
            kv = _is_options_entry(ent)
            if kv is None:
                continue
            name, val = kv
            self.emit("option", ent, cf=NO_CF, name=name, msg=val,
                      attrs={"section": "db_wide"})
            emitted = True
            if name == g.DB_WIDE_WRITE_BUFFER_MANAGER_OPTIONS_NAME:
                for pname, pval in wbm_re.findall(ent.get_msg()):
                    self.emit("option", ent, cf=NO_CF,
                              name=f"write_buffer_manager_{pname}", msg=pval,
                              attrs={"section": "db_wide"})
        if not emitted:
            raise ValueError("empty db-wide options")

        self.db_wide_options_set = True
        self.entry_idx = sup_idx
        return True

    # -- cf options (log_file.py:305-326,373-384; parser 204-259) ----------
    def try_cf_options(self) -> bool:
        e = self.cur()
        msg = e.get_msg()
        # CF_OPTIONS_START requires this literal; skip the regex scan
        # (this probe runs once per entry in the dispatch chain)
        header = _CF_OPTIONS_START_RE.findall(msg) \
            if "Options for column family [" in msg else []
        if len(header) == 1:
            self._parse_cf_options(cf_name=header[0], auto_generated=False,
                                   skip_header=True)
            return True
        if _is_options_entry(e) is not None:
            if not self.db_wide_options_set:
                raise DocAbort("cf options before db-wide options")
            # rolled log: auto-generate the cf name (log_file.py:295-303)
            if self.next_unknown_cf_suffix is None:
                self.next_unknown_cf_suffix = 1
                cf_name, auto = g.DEFAULT_CF_NAME, False
            else:
                cf_name = f"Unknown-CF-#{self.next_unknown_cf_suffix}"
                self.next_unknown_cf_suffix += 1
                auto = True
            self._parse_cf_options(cf_name=cf_name, auto_generated=auto,
                                   skip_header=False)
            return True
        return False

    def _parse_cf_options(self, cf_name, auto_generated, skip_header):
        header_entry = self.cur()
        if skip_header:
            self.entry_idx += 1

        seen = set()
        n_options = 0
        table_seen = False
        while self.entry_idx < len(self.entries):
            ent = self.cur()
            kv = _is_options_entry(ent)
            if kv is not None:
                name, val = kv
                if name in seen:
                    break  # duplicate option => next cf section starts
                seen.add(name)
                n_options += 1
                self.emit("option", ent, cf=cf_name, name=name, msg=val,
                          attrs={"section": "cf"})
            else:
                tbl = _try_parse_table_options(ent)
                if tbl is not None:
                    if table_seen:
                        raise DocAbort("duplicate table options block")
                    table_seen = True
                    for name, val in tbl.items():
                        self.emit("option", ent, cf=cf_name, name=name,
                                  msg=val, attrs={"section": "table"})
                else:
                    break
            self.entry_idx += 1

        if n_options == 0:
            raise DocAbort("no options for column family")
        if not table_seen:
            raise DocAbort("missing table options in cf options")

        self.add_cf_found(cf_name, header_entry, "options",
                          has_options=True, auto_generated=auto_generated)

    # -- warnings (warnings_mngr.py:60-74) ---------------------------------
    def try_warning(self) -> bool:
        e = self.cur()
        if not e.warn_type:
            return False
        self.emit("warning", e, warn_type=e.warn_type, code_pos=e.code_pos,
                  msg=e.get_msg())
        self.entry_idx += 1
        return True

    # -- events (events.py:772-931) ----------------------------------------
    def try_event(self) -> bool:
        e = self.cur()
        msg = e.get_msg()

        # preamble? (events.py:180-199,790-811)
        pre = None
        m = _FLUSH_PRE_RE.search(msg)
        if m:
            pre = {"cf": m.group("cf"), "job_id": int(m.group("job_id")),
                   "type": "flush_started", "wal_id": int(m.group("wal_id"))}
        else:
            m = _COMP_PRE_RE.search(msg)
            if m:
                pre = {"cf": m.group("cf"), "job_id": int(m.group("job_id")),
                       "type": "compaction_started", "wal_id": None}
        if pre is not None:
            jid = pre["job_id"]
            if jid not in self.preambles:
                self.preambles[jid] = pre
            # conflicting preamble for same job: keep existing (events.py:799-810)
            self.add_cf_found(pre["cf"], e, "during_parsing")
            self.entry_idx += 1
            return True

        if not _EVENT_RE.findall(msg):
            return False

        # parse the json payload (events.py:202-259)
        consumed = True
        brace = msg.find("{")
        raw_json = msg[brace:] if brace >= 0 else ""
        try:
            details = json.loads(raw_json)
        except (json.JSONDecodeError, ValueError):
            self.emit("quarantine", e, attrs={"reason": "bad_event_json"},
                      msg=msg)
            self.entry_idx += 1
            return consumed

        event_type = details.get("event")
        supported = {
            "flush_started", "flush_finished", "compaction_started",
            "compaction_finished", "table_file_creation",
            "table_file_deletion",
        }
        mandatory = {
            "flush_started": ["time_micros", "flush_reason"],
            "flush_finished": ["time_micros"],
            "compaction_started": ["time_micros", "compaction_reason"],
            "compaction_finished": ["time_micros"],
            "table_file_creation": ["time_micros", "cf_name", "file_number",
                                    "table_properties"],
            "table_file_deletion": ["time_micros", "file_number"],
        }  # events.py:493-496,524-526,551-554,590-592,651-656,763-766
        if event_type not in supported or "job" not in details or any(
                f not in details for f in mandatory[event_type]):
            self.emit("quarantine", e, attrs={"reason": "bad_event"},
                      msg=msg)
            self.entry_idx += 1
            return consumed

        job_id = details["job"]
        cf_name = details.get("cf_name", NO_CF)
        wal_id = None

        # preamble merge (events.py:834-841,391-401)
        pre = self.preambles.get(job_id)
        if pre is not None and pre["type"] == event_type:
            if cf_name != NO_CF and cf_name != pre["cf"]:
                # set_cf_name conflict -> event discarded (events.py:360-371)
                self.emit("quarantine", e,
                          attrs={"reason": "preamble_cf_conflict"}, msg=msg)
                self.entry_idx += 1
                return consumed
            cf_name = pre["cf"]
            wal_id = pre["wal_id"]
            del self.preambles[job_id]

        # db-wide -> borrow unique cf of earlier same-job events
        # (events.py:860-879)
        if cf_name == NO_CF and job_id in self.job_events:
            cfs = [c for c in self.job_events[job_id] if c != NO_CF]
            if len(cfs) == 1:
                cf_name = cfs[0]

        # validate job doesn't span multiple real cfs (events.py:894-910)
        job_cfs = self.job_events.setdefault(job_id, {})
        if job_cfs and cf_name != NO_CF and cf_name not in job_cfs:
            real = [c for c in job_cfs if c != NO_CF]
            if real:
                self.emit("quarantine", e,
                          attrs={"reason": "job_multi_cf"}, msg=msg)
                self.entry_idx += 1
                return consumed
        job_cfs.setdefault(cf_name, set()).add(event_type)

        attrs = {}
        if wal_id is not None:
            attrs["wal_id"] = str(wal_id)

        self.emit(
            "event", e, event_type=event_type, job_id=job_id, cf=cf_name,
            time_micros=details.get("time_micros"), payload_json=raw_json,
            attrs=attrs or None,
        )
        if cf_name != NO_CF:
            self.add_cf_found(cf_name, e, "during_parsing")
        self.entry_idx += 1
        return consumed

    # -- stats dumps (stats_mngr.py:1003-1233) ------------------------------
    def try_stats(self) -> bool:
        e = self.cur()

        # standalone "CF Stats [cf]" entry (stats_mngr.py:1172-1189)
        first_line = e.get_msg_lines()[0] if e.msg_lines else ""
        m = _CF_STATS_RE.fullmatch(first_line)
        if m:
            cf = m.group("cf")
            self.add_cf_found(cf, e, "during_parsing")
            self._scan_stats_lines(e, e.get_msg_lines(), cf_name=cf,
                                   curr_type="CF_STATS")
            self.entry_idx += 1
            return True

        if e.get_msg().startswith(g.DUMP_STATS_STR):
            self.dump_stats_entry_found = True
            self.entry_idx += 1
            if self.entry_idx >= len(self.entries):
                return True
            nxt = self.entries[self.entry_idx]
            lines = nxt.get_msg_lines()
            while lines and not lines[0]:
                lines = lines[1:]
            if lines and _DB_STATS_RE.fullmatch(lines[0]):
                self.dump_stats_entry_found = False
                self._scan_stats_lines(nxt, lines, cf_name=NO_CF,
                                       curr_type="DB_WIDE")
                self.entry_idx += 1
            return True

        if not self.dump_stats_entry_found:
            return False

        lines = e.get_msg_lines()
        while lines and not lines[0]:
            lines = lines[1:]
        if lines and _DB_STATS_RE.fullmatch(lines[0]):
            self.dump_stats_entry_found = False
            self._scan_stats_lines(e, lines, cf_name=NO_CF,
                                   curr_type="DB_WIDE")
            self.entry_idx += 1
            return True
        return False

    def _scan_stats_lines(self, entry, lines, cf_name, curr_type):
        """Sub-section scanner (stats_mngr.py:1037-1063,1191-1233)."""
        comp_start = g.compiled(g.COMPACTION_STATS)
        filehist_start = g.compiled(g.FILE_READ_LATENCY_STATS)
        uptime = g.compiled(g.UPTIME_STATS_LINE)
        cache_start = g.compiled(g.BLOCK_CACHE_STATS_START)
        blob = g.compiled(g.BLOB_STATS_LINE)

        idx = 0
        stype = curr_type
        cur_cf = cf_name if curr_type == "CF_STATS" else NO_CF

        while idx < len(lines):
            # find next section start (stats_mngr.py:1037-1063)
            nxt = idx + 1
            next_type = None
            next_cf = None
            while nxt < len(lines) and next_type is None:
                line = lines[nxt]
                cm = comp_start.fullmatch(line)
                fm = filehist_start.fullmatch(line)
                if cm:
                    next_type, next_cf = "COMPACTION", cm.group("cf")
                elif blob.findall(line):
                    next_type = "BLOB"
                elif cache_start.findall(line):
                    next_type = "BLOCK_CACHE"
                elif fm:
                    next_type, next_cf = "CF_FILE_HISTOGRAM", fm.group("cf")
                elif uptime.search(line) and stype != "DB_WIDE":
                    next_type = "CF_NO_FILE"
                else:
                    nxt += 1

            section = [ln.strip() for ln in lines[idx:nxt]]
            try:
                self._parse_stats_section(entry, stype, cur_cf, section)
            except Exception:
                pass  # logged + skipped in the reference

            idx = nxt
            stype = next_type
            if next_cf is not None:
                cur_cf = next_cf
                if next_cf != NO_CF:
                    self.add_cf_found(next_cf, entry, "during_parsing")

    def _parse_stats_section(self, entry, stype, cf, lines):
        if stype == "DB_WIDE":
            self._parse_db_wide_stats(entry, lines)
        elif stype == "COMPACTION":
            self._parse_compaction_stats(entry, cf, lines)
        elif stype == "BLOB":
            self._parse_blob_stats(entry, cf, lines)
        elif stype == "BLOCK_CACHE":
            self._parse_block_cache_stats(entry, cf, lines)
        elif stype == "CF_NO_FILE":
            self._parse_cf_no_file_stats(entry, cf, lines)
        elif stype == "CF_FILE_HISTOGRAM":
            self._parse_file_histogram_stats(entry, cf, lines)
        # CF_STATS header section itself carries nothing (stats_mngr.py:1122)

    # stats_mngr.py:66-188
    def _parse_db_wide_stats(self, entry, lines):
        stall = {}
        for line in lines[1:]:
            m = g.compiled(g.DB_WIDE_INTERVAL_STALL).findall(line)
            if m:
                h, mi, s, ms, pct = m[0]
                stall["interval_duration_ms"] = (
                    (int(h) * 3600 + int(mi) * 60 + int(s)) * 1000 + int(ms))
                stall["interval_percent"] = float(pct)
                continue
            m = g.compiled(g.DB_WIDE_CUMULATIVE_STALL).findall(line)
            if m:
                h, mi, s, ms, pct = m[0]
                stall["cumulative_duration_ms"] = (
                    (int(h) * 3600 + int(mi) * 60 + int(s)) * 1000 + int(ms))
                stall["cumulative_percent"] = float(pct)
                continue
            m = g.compiled(g.DB_WIDE_CUMULATIVE_WRITES).findall(line)
            if m:
                w, wu, k, ku, ingest_gb, rate = m[0]
                self.emit(
                    "cumulative_writes", entry,
                    attrs={
                        "num_writes": str(human_num_to_int(w, wu)),
                        "num_keys": str(human_num_to_int(k, ku)),
                        "ingest": str(human_bytes_to_int(ingest_gb, "GB")),
                        "ingest_rate_mbps": str(float(rate)),
                    })

        all_zero = (
            stall.get("interval_duration_ms", 0) == 0
            and stall.get("interval_percent", 0.0) == 0.0
            and stall.get("cumulative_duration_ms", 0) == 0
            and stall.get("cumulative_percent", 0.0) == 0.0
        )
        if stall and not all_zero:
            self.emit("db_stats_stall", entry,
                      attrs={k: str(v) for k, v in stall.items()})

    # stats_mngr.py:263-399
    def _parse_compaction_stats(self, entry, cf, lines):
        start = g.compiled(g.COMPACTION_STATS).fullmatch(lines[0])
        cf_name = start.group("cf") if start else cf
        body = lines[1:]
        if not body:
            return
        if body[0].startswith("Priority"):
            return  # not parsed by the reference (stats_mngr.py:425-432)
        if not body[0].startswith("Level") or len(body) < 2:
            return
        header = body[0].split()
        if header[:3] != ["Level", "Files", "Size"]:
            return
        if set(body[1].strip()) != {"-"}:
            return

        rows = {}
        for line in body[2:]:
            fields = line.split()
            if not fields:
                continue
            t = fields[0]
            if t == "Sum":
                key = "SUM"
            elif t == "Int":
                key = "INTERVAL"
            elif t == "User":
                key = "USER"
            else:
                lm = g.compiled(r"L(\d+)").findall(t)
                if not lm:
                    return
                key = f"LEVEL-{int(lm[0])}"
            fm = g.compiled(r"(\d+)/(\d+)").findall(fields[1])
            if not fm:
                return
            row = {
                "Num-Files": fm[0][0],
                "Files-In-Comp": fm[0][1],
                "size_bytes": str(human_bytes_to_int(fields[2], fields[3])),
            }
            if len(fields) != len(header) + 1:
                return  # malformed table row aborts (stats_mngr.py:374-384)
            row.update({header[i]: fields[i + 1] for i in range(3, len(header))})
            rows[key] = row

        if "SUM" not in rows:
            return
        self.comp_entries[(entry.time, cf_name)] = [
            (key, row, entry.start_line_idx) for key, row in rows.items()]

    # stats_mngr.py:551-600
    def _parse_blob_stats(self, entry, cf, lines):
        m = g.compiled(g.BLOB_STATS_LINE).findall(lines[0])
        if not m:
            return
        count, total_gb, garbage_gb, amp = m[0]
        self.emit("blob_stats", entry, cf=cf, attrs={
            "file_count": str(int(count)),
            "total_size": str(human_bytes_to_int(total_gb, "GB")),
            "garbage_size": str(human_bytes_to_int(garbage_gb, "GB")),
            "space_amp": str(float(amp)),
        })

    # stats_mngr.py:855-1001
    def _parse_block_cache_stats(self, entry, cf, lines):
        if len(lines) < 2:
            return
        m = g.compiled(g.BLOCK_CACHE_STATS_START).findall(lines[0])
        if not m:
            return
        cache_id, cap, cap_unit = m[0]
        capacity = human_bytes_to_int(cap, cap_unit)
        self.emit("block_cache", entry, name=cache_id, cf=NO_CF,
                  attrs={"row": "capacity", "capacity": str(capacity)})

        gm = g.compiled(g.BLOCK_CACHE_ENTRY_STATS).findall(lines[1])
        if gm:
            roles = g.compiled(g.BLOCK_CACHE_ENTRY_ROLES_NAMES).findall(gm[0])
            stats = g.compiled(g.BLOCK_CACHE_ENTRY_ROLES_STATS).findall(gm[0])
            if len(roles) == len(stats):
                usage = 0
                for role, st in zip(roles, stats):
                    count, size_s, portion = st.split(",")
                    size_b = _parse_bytes_with_unit(size_s)
                    usage += size_b
                    self.emit("block_cache", entry, name=cache_id, cf=NO_CF,
                              attrs={"row": "role", "role": role,
                                     "count": str(int(count)),
                                     "size": str(size_b),
                                     "portion":
                                     f"{float(portion.split('%')[0]):.2f}%"})
                self.emit("block_cache", entry, name=cache_id, cf=NO_CF,
                          attrs={"row": "usage", "usage": str(usage)})
        if len(lines) > 2:
            cm = g.compiled(g.BLOCK_CACHE_CF_ENTRY_STATS).findall(lines[2])
            if cm:
                cf_name, roles_part = cm[0]
                roles = g.compiled(g.BLOCK_CACHE_ENTRY_ROLES_NAMES).findall(
                    roles_part)
                stats = g.compiled(g.BLOCK_CACHE_ENTRY_ROLES_STATS).findall(
                    roles_part)
                if len(roles) == len(stats):
                    for role, st in zip(roles, stats):
                        size_b = _parse_bytes_with_unit(st)
                        if size_b > 0:
                            self.emit("block_cache", entry, name=cache_id,
                                      cf=cf_name,
                                      attrs={"row": "cf_role", "role": role,
                                             "size": str(size_b)})

    # stats_mngr.py:608-652
    def _parse_cf_no_file_stats(self, entry, cf, lines):
        for line in lines:
            line = line.strip()
            if not line.startswith(g.CF_STALLS_LINE_START):
                continue
            pairs = []
            for m in g.compiled(g.CF_STALLS_COUNT_AND_REASON).finditer(line):
                pairs.append((m[2], int(m[1])))
            if not pairs:
                continue
            total = g.compiled(g.CF_STALLS_INTERVAL_COUNT).findall(line)
            if len(total) != 1:
                continue
            total_count = int(total[0])
            if sum(c for _, c in pairs) + total_count == 0:
                continue
            for reason, count in pairs:
                self.emit("cf_stalls", entry, cf=cf, name=reason, value=count)
            self.emit("cf_stalls", entry, cf=cf, name="interval_total_count",
                      value=total_count)

    # stats_mngr.py:664-835
    def _parse_file_histogram_stats(self, entry, cf, lines):
        start = g.compiled(g.FILE_READ_LATENCY_STATS).fullmatch(lines[0])
        cf_name = start.group("cf") if start else cf
        level_re = g.compiled(g.LEVEL_READ_LATENCY_LEVEL_LINE)
        l1 = g.compiled(g.LEVEL_READ_LATENCY_STATS_LINE1)
        l2 = g.compiled(g.LEVEL_READ_LATENCY_STATS_LINE2)

        idx = 1
        seen_levels = set()
        n = len(lines)
        while idx < n:
            nxt = idx + 1
            while nxt < n and not level_re.findall(lines[nxt]):
                nxt += 1
            block = lines[idx:nxt]
            if len(block) >= 3:
                lv = level_re.findall(block[0])
                m1 = l1.findall(block[1])
                m2 = l2.findall(block[2])
                if lv and m1 and m2:
                    level = int(lv[0])
                    if level not in seen_levels:
                        seen_levels.add(level)
                        self.emit(
                            "read_latency", entry, cf=cf_name, value=level,
                            attrs={
                                "count": m1[0][0], "average": m1[0][1],
                                "std_dev": m1[0][2], "min": m2[0][0],
                                "median": m2[0][1], "max": m2[0][2],
                            })
            idx = nxt

    # -- counters (counters.py:15-161) --------------------------------------
    def try_counters(self) -> bool:
        e = self.cur()
        lines = e.get_msg_lines()
        if not lines or not _STATS_HDR_RE.findall(lines[0]):
            return False

        counter_re = _COUNTER_RE
        hist_re = _HIST_RE
        ts = e.time
        for line in lines[1:]:
            cm = counter_re.findall(line)
            if cm:
                name, value = cm[0][0], int(cm[0][1])
                prev = self.counter_last.get(name)
                if prev is not None and value < prev:
                    continue  # monotonicity drop (counters.py:85-96)
                self.counter_last[name] = value
                self.emit("counter", e, ts=ts, name=name, value=value)
                continue
            hm = hist_re.fullmatch(line)
            if hm:
                name = hm.group("name")
                count = int(hm.group("count"))
                total = int(hm.group("sum"))
                prev_count, prev_total = self.hist_last.get(name, (0, 0))
                if name in self.hist_last and (
                        count < prev_count or total < prev_total):
                    continue  # counters.py:139-147
                if total > 0:
                    average = float(f"{(total / count):.2f}")
                else:
                    average = 0.0
                self.hist_last[name] = (count, total)
                self.emit(
                    "histogram", e, ts=ts, name=name, value=count,
                    attrs={
                        "P50": hm.group("P50"), "P95": hm.group("P95"),
                        "P99": hm.group("P99"), "P100": hm.group("P100"),
                        "Count": str(count), "Sum": str(total),
                        "Average": repr(average),
                        "Interval Count": str(count - prev_count),
                        "Interval Sum": str(total - prev_total),
                    })
                continue
            # badly formed line: logged + skipped in the reference

        self.entry_idx += 1
        return True

    # -- memory reporting (mem_rep_parser.py:25-160) --------------------------
    def try_mem_rep(self) -> bool:
        e = self.cur()
        lines = e.get_msg_lines()
        while lines and not lines[0]:
            lines = lines[1:]
        if not lines or not _MEM_TITLE_RE.fullmatch(lines[0]):
            return False
        try:
            self._parse_mem_rep(e, lines)
        except ValueError:
            pass  # reference logs + skips the whole entry, still consumed
        self.entry_idx += 1
        return True

    def _parse_mem_rep(self, e, lines):
        total_re = g.compiled(g.MEM_REP_TOTAL_LINE)
        entity_re = g.compiled(g.MEM_REP_ENTITY_USAGE_LINE)
        cf_re = g.compiled(g.MEM_REP_CF_USAGE_LINE)
        records: list[tuple] = []

        idx = 1
        if idx >= len(lines) or lines[idx].strip() != \
                g.MEM_REP_ARENA_STATS_TITLE:
            raise ValueError("missing arena title")
        idx += 1
        m = total_re.fullmatch(lines[idx].strip()) if idx < len(lines) else None
        if not m:
            raise ValueError("missing arena total")
        records.append(("arena_total", None, None, m["usage"]))
        idx += 1
        while idx < len(lines):
            line = lines[idx].strip()
            if line == g.MEM_REP_CFS_STATS_TITLE:
                break
            em = entity_re.fullmatch(line)
            if em is None:
                break
            records.append(("arena", em["entity"], None, em["usage"]))
            idx += 1

        if idx >= len(lines) or lines[idx].strip() != \
                g.MEM_REP_CFS_STATS_TITLE:
            raise ValueError("missing cfs title")
        idx += 1
        m = total_re.fullmatch(lines[idx].strip()) if idx < len(lines) else None
        if not m:
            raise ValueError("missing cfs total")
        records.append(("cfs_total", None, None, m["usage"]))
        idx += 1
        while idx < len(lines):
            cm = cf_re.fullmatch(lines[idx].strip())
            if cm is None:
                break
            records.append(("cf", None, cm["cf"], cm["usage"]))
            idx += 1

        while idx < len(lines):
            em = entity_re.fullmatch(lines[idx].strip())
            if em is None:
                break
            records.append(("misc", em["entity"], None, em["usage"]))
            idx += 1

        for section, entity, cf, usage in records:
            self.emit("memrep", e, name=section, cf=cf, msg=usage,
                      attrs={"entity": entity} if entity else None)

    # -- compaction monitors (compactions.py:88-156) -------------------------
    def try_monitors(self) -> bool:
        e = self.cur()
        m = _PREFINISH_RE.findall(e.get_msg())
        if not m:
            return False
        cf, rd, wr, rw_amp, w_amp, rec_in, rec_drop = m[0]
        self.emit("prefinish", e, cf=cf, attrs={
            "read_rate_mbps": str(float(rd)),
            "write_rate_mbps": str(float(wr)),
            "read_write_amplify": str(float(rw_amp)),
            "write_amplify": str(float(w_amp)),
            "records_in": str(int(rec_in)),
            "records_dropped": str(int(rec_drop)),
        })
        self.add_cf_found(cf, e, "during_parsing")
        return True  # entry_idx advanced by the caller


def _parse_bytes_with_unit(s: str) -> int:
    m = g.compiled(fr"{g.FLOAT_C}\s*{g.BYTES_UNIT}?\s*\Z").findall(s.strip())
    if not m:
        raise ValueError(f"bad size: {s}")
    return human_bytes_to_int(m[0][0], m[0][1])


def parse_document(text: str) -> list[dict]:
    """Parse one whole LOG document into a list of flat record dicts."""
    return DocumentParser(text).run()


def parse_document_stream(text: str, flush_every: int = 200_000):
    """Generator of record batches for one document (oversized-document
    path: lazy segmentation + incremental record flushes keep peak
    memory ~1x the text)."""
    return DocumentParser(text).run_stream(flush_every)
