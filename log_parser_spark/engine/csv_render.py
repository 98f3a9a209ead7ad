"""Driver-side CSV renderers: per-url byte-identical reproductions of the
reference CSV families from the long sink DataFrames.

These run at the report edge on one url's (small) sink rows — they are
deliberately NOT distributed operators (the reference equivalents,
csv_outputter.py:25-493, are per-file string builders).  They serve two
purposes: user-facing CSV export and the byte-parity differential tests.

Each function takes rows for a SINGLE url as a list of dicts
(Row.asDict()) and returns the CSV text, or None when the reference
would produce no CSV.
"""

from __future__ import annotations

import csv
import io
import json


def _writer():
    f = io.StringIO()
    return f, csv.writer(f)


def _num(v):
    """Longs from Spark come back as ints; doubles as floats — both
    str() identically to the reference's csv writer output."""
    return v


# ---------------------------------------------------------------- counters

def render_counters_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:25-72."""
    if not rows:
        return None
    names = {}
    for r in rows:
        names.setdefault(r["name"], r["first_seen"])
    ordered = sorted(names, key=lambda n: names[n])
    times = sorted({r["ts"] for r in rows})
    cells = {(r["ts"], r["name"]): r["value"] for r in rows}

    f, w = _writer()
    w.writerow(["Time"] + ordered)
    for t in times:
        w.writerow([t] + [cells.get((t, n), 0) for n in ordered])
    return f.getvalue()


_HIST_VALUE_COLS = ["p50", "p95", "p99", "p100", "count", "sum", "average",
                    "interval_count", "interval_sum"]
_HIST_DISPLAY = ["P50", "P95", "P99", "P100", "Count", "Sum", "Average",
                 "Interval Count", "Interval Sum"]


def _hist_grid(rows):
    names = {}
    for r in rows:
        names.setdefault(r["name"], r["first_seen"])
    ordered = sorted(names, key=lambda n: names[n])
    times = sorted({r["ts"] for r in rows})
    cells = {(r["ts"], r["name"]): r for r in rows}
    return ordered, times, cells


def render_human_histograms_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:75-141 (incl. the reference's 9-values-under-
    6-column-headers layout quirk)."""
    if not rows:
        return None
    ordered, times, cells = _hist_grid(rows)

    header_cols = _HIST_DISPLAY[:6]  # Average / Interval * removed
    f, w = _writer()
    h1, h2 = [""], [""]
    for name in ordered:
        h1.extend([name] + ["." for _ in range(len(header_cols) - 1)])
        h2.extend(header_cols)
    w.writerow(h1)
    w.writerow(h2)

    for t in times:
        line = [t]
        for name in ordered:
            r = cells.get((t, name))
            if r is not None and r["present"]:
                line.extend(_num(r[c]) for c in _HIST_VALUE_COLS)
            else:
                line.extend([0] * len(header_cols))
        w.writerow(line)
    return f.getvalue()


def render_tools_histograms_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:144-195 (incl. truncated rows after a histogram's
    samples are exhausted)."""
    if not rows:
        return None
    ordered, times, cells = _hist_grid(rows)

    f, w = _writer()
    w.writerow(["Name", "Time"] + _HIST_DISPLAY)
    for name in ordered:
        n_samples = sum(
            1 for t in times
            if (r := cells.get((t, name))) is not None and r["present"])
        consumed = 0
        for t in times:
            line = [name, t]
            if consumed < n_samples:
                r = cells.get((t, name))
                if r is not None and r["present"]:
                    consumed += 1
                    line.extend(_num(r[c]) for c in _HIST_VALUE_COLS)
                else:
                    line.extend([0] * len(_HIST_DISPLAY))
            w.writerow(line)
    return f.getvalue()


# ---------------------------------------------------------- compaction stats

def render_compaction_stats_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:198-220; rows must carry the per-url emission
    order in `seq` (== the reference's dict iteration order)."""
    if not rows:
        return None
    rows = sorted(rows, key=lambda r: r["seq"])
    columns = list(json.loads(rows[0]["payload_json"]).keys())
    f, w = _writer()
    w.writerow(["Time", "Column Family", "Level"] + columns)
    for r in rows:
        d = json.loads(r["payload_json"])
        w.writerow([r["ts"], r["cf"], r["level_key"]]
                   + [d.get(c, "") for c in columns])
    return f.getvalue()


# ----------------------------------------------------------------- flushes

_FLOW_FIELDS_TO_DEL = ["cf_name", "time_micros", "event"]


def _merged_flow_dict(r):
    start = json.loads(r["start_payload"])
    if r.get("wal_id") is not None and "wal_id" not in start:
        start["wal_id"] = r["wal_id"]  # set_wal_id appends (events.py:373-382)
    if r.get("finish_payload"):
        finish = json.loads(r["finish_payload"])
        for k, v in finish.items():
            start.setdefault(k, v)
    for k in _FLOW_FIELDS_TO_DEL:
        start.pop(k, None)
    return start


def render_flushes_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:223-266 (get_flow_events_csv for Flush)."""
    if not rows:
        return None
    # ties on start time break by cf-registry order, then document
    # order — the reference stable-sorts per-cf lists concatenated in
    # registry order (csv_outputter.py:223-232, events.py:982-995)
    rows = sorted(rows, key=lambda r: (r["start_ts"],
                                       r.get("cf_rank") or 0,
                                       r["start_seq"]))
    f, w = _writer()
    header = None
    for r in rows:
        d = _merged_flow_dict(r)
        if header is None:
            header = list(d.keys())
            w.writerow(["Start Time", "Finish Time", "Column Family"]
                       + header)
        finish_ts = r["finish_ts"] if r["finish_ts"] else "UNKNOWN"
        w.writerow([r["start_ts"], finish_ts, r["cf"]] + list(d.values()))
    return f.getvalue()


# -------------------------------------------------------------- compactions

def _process_compactions_header(columns):
    """csv_outputter.py:277-339."""
    prefix = "files_L"
    files_cols = [c for c in columns if c.startswith(prefix)]
    if not files_cols:
        return None
    updated = list(columns)
    if len(files_cols) > 2:
        for c in files_cols[2:]:
            updated.remove(c)
        files_cols = files_cols[:2]

    first_idx = updated.index(files_cols[0])
    first_level = int(files_cols[0][len(prefix):])
    updated[first_idx] = "Input Level Files"
    second_level = None
    if len(files_cols) > 1:
        second_idx = updated.index(files_cols[1])
        if second_idx != first_idx + 1:
            return None
        second_level = int(files_cols[1][len(prefix):])
        updated[second_idx] = "Input Files from Output Level"
    else:
        updated.insert(first_idx + 1, "Input Files from Output Level")
    return updated, first_idx, first_level, second_level


def render_compactions_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:342-424."""
    if not rows:
        return None
    rows = sorted(rows, key=lambda r: r["start_seq"])

    f, w = _writer()
    header_info = None
    for r in rows:
        if not r["finish_ts"]:
            continue
        d = {}
        if r.get("records_dropped") is not None:
            d = {"cf_name": r["cf"],
                 "read_rate_mbps": r["read_rate_mbps"],
                 "write_rate_mbps": r["write_rate_mbps"],
                 "read_write_amplify": r["read_write_amplify"],
                 "write_amplify": r["write_amplify"],
                 "records_in": r["records_in"],
                 "records_dropped": r["records_dropped"]}
        start = json.loads(r["start_payload"])
        finish = json.loads(r["finish_payload"])
        for src in (start, finish):
            for k, v in src.items():
                d.setdefault(k, v)
        for k in ["cf_name", "time_micros", "event", "records_in",
                  "records_dropped"]:
            d.pop(k, None)

        columns = list(d.keys())
        cur = _process_compactions_header(columns)
        if header_info is None:
            header_info = cur
            if header_info is None:
                return None
            w.writerow(["Start Time", "Finish Time", "Column Family"]
                       + header_info[0])
        else:
            if cur is None or cur[1] != header_info[1]:
                continue

        _, first_idx, first_level, second_level = cur
        values = list(d.values())
        values[first_idx] = f"Level{first_level}: {values[first_idx]}"
        if second_level is not None:
            values[first_idx + 1] = \
                f"Level{second_level}: {values[first_idx + 1]}"
        else:
            values.insert(first_idx + 1, "")
        w.writerow([r["start_ts"], r["finish_ts"], r["cf"]] + values)

    if header_info is None:
        return None
    return f.getvalue()


# ------------------------------------------------------------------- files

class FilesHeaderMismatch(AssertionError):
    """The reference asserts that every file row shares the first file's
    header (csv_outputter.py:485) — its CLI dies on such logs.  We
    surface the same refusal as a typed error."""


def render_files_csv(rows: list[dict]) -> str | None:
    """csv_outputter.py:431-493."""
    if not rows:
        return None
    rows = sorted(rows, key=lambda r: r["seq"]) if rows and "seq" in rows[0] \
        else rows

    f, w = _writer()
    header = None
    for r in rows:
        creation = json.loads(r["creation_payload"])
        table_props = dict(creation.get("table_properties", {}))
        table_props.pop("compression_options", None)

        d = {"status": r["status"], "created": r["created_ts"],
             "deleted": r["deleted_ts"] if r["deleted_ts"] else ""}
        for k, v in creation.items():
            d.setdefault(k, v)
        for k in ["time_micros", "event", "job", "table_properties",
                  "oldest_blob_file_number"]:
            d.pop(k, None)
        for k, v in table_props.items():
            d.setdefault(k, v)

        if header is None:
            header = list(d.keys())
            w.writerow(header)
        elif list(d.keys()) != header:
            raise FilesHeaderMismatch(str(r["file_number"]))
        w.writerow(list(d.values()))
    if header is None:
        return None
    return f.getvalue()
