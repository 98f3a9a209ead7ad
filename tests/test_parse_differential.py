"""Differential tests: our per-document parse engine vs the reference
implementation (used strictly as an oracle) on the reference's own
fixture corpus.  These assert the BASELINE.json per-row invariant:
byte-identical extraction per document."""

import glob
import os

import pytest

from log_parser_spark.parsing import parse_document
from tests.conftest import REFERENCE, fixture_log, parsed_ref_log

SAMPLE_LOGS = ["LOG_sample", "Rolled_LOG_sample.txt"]
BASELINE_LOGS = sorted(
    glob.glob(os.path.join(REFERENCE, "baseline_logs", "LOG-*")))


def _mine(text):
    return parse_document(text)


def _options_dicts(recs):
    db_wide, cf_opts, table = {}, {}, {}
    for r in recs:
        if r["kind"] != "option":
            continue
        sec = r["attrs"]["section"]
        if sec == "db_wide":
            db_wide[r["name"]] = r["msg"]
        elif sec == "cf":
            cf_opts.setdefault(r["cf"], {})[r["name"]] = r["msg"]
        else:
            table.setdefault(r["cf"], {})[r["name"]] = r["msg"]
    return db_wide, cf_opts, table


def _ref_options_dicts(reference, pl):
    dbo = reference["db_options"]
    od = pl.get_database_options().options_dict
    db_wide = od.get(dbo.SectionType.DB_WIDE, {}).get(dbo.DB_WIDE_CF_NAME, {})
    return (db_wide, od.get(dbo.SectionType.CF, {}),
            od.get(dbo.SectionType.TABLE_OPTIONS, {}))


@pytest.mark.parametrize("name", SAMPLE_LOGS)
def test_options_match_reference(reference, name):
    pl = parsed_ref_log(reference, name)
    recs = _mine(fixture_log(name))
    assert _ref_options_dicts(reference, pl) == _options_dicts(recs)


@pytest.mark.parametrize("name", SAMPLE_LOGS)
def test_events_match_reference(reference, name):
    pl = parsed_ref_log(reference, name)
    recs = _mine(fixture_log(name))
    ref_events = []
    for job_id, job in pl.get_events_mngr().debug_get_all_events().items():
        for cf, types in job.items():
            for t, evs in types.items():
                for e in evs:
                    ref_events.append((e.get_log_time(), str(t), job_id, cf))
    mine = [(r["ts"], r["event_type"], r["job_id"], r["cf"])
            for r in recs if r["kind"] == "event"]
    assert sorted(ref_events) == sorted(mine)


@pytest.mark.parametrize("name", SAMPLE_LOGS)
def test_cf_registry_matches_reference(reference, name):
    pl = parsed_ref_log(reference, name)
    recs = _mine(fixture_log(name))
    mine_all = [r["cf"] for r in recs if r["kind"] == "cf_found"]
    assert sorted(pl.get_cfs_names(include_auto_generated=True)) == \
        sorted(mine_all)
    mine_non_auto = [r["cf"] for r in recs if r["kind"] == "cf_found"
                     and r["attrs"]["auto_generated"] == "False"]
    assert sorted(pl.get_cfs_names(include_auto_generated=False)) == \
        sorted(mine_non_auto)


def test_counters_and_histograms_match_reference(reference):
    """LOG_sample_stats.txt via the reference CountersMngr (the fixture has
    no metadata header, so full-ParsedLog rejects it; the manager is the
    oracle, as in the reference's own test_counters.py)."""
    log_entry = reference["log_entry"].LogEntry
    mngr = reference["counters"].CountersMngr()
    lines = fixture_log("LOG_sample_stats.txt").splitlines()
    entries, cur = [], None
    for i, line in enumerate(lines):
        if log_entry.is_entry_start(line):
            if cur:
                entries.append(cur.all_lines_added())
            cur = log_entry(i, line)
        else:
            if cur:
                cur.add_line(line)
    if cur:
        entries.append(cur.all_lines_added())
    for e in entries:
        if reference["counters"].CountersMngr.is_your_entry(e):
            mngr.add_entry(e)

    header = (
        "2022/11/24-15:58:00.000000 32851 RocksDB version: 7.2.2\n"
        "2022/11/24-15:58:00.000001 32851 Options.error_if_exists: 0\n"
        "2022/11/24-15:58:00.000002 32851 "
        "Compression algorithms supported:\n")
    recs = _mine(header + fixture_log("LOG_sample_stats.txt"))

    mine_counters, mine_hists = {}, {}
    for r in recs:
        if r["kind"] == "counter":
            mine_counters.setdefault(r["name"], []).append(
                {"time": r["ts"], "value": r["value"]})
        elif r["kind"] == "histogram":
            a = r["attrs"]
            mine_hists.setdefault(r["name"], []).append(
                {"time": r["ts"], "values": {
                    "P50": float(a["P50"]), "P95": float(a["P95"]),
                    "P99": float(a["P99"]), "P100": float(a["P100"]),
                    "Count": int(a["Count"]), "Sum": int(a["Sum"]),
                    "Average": float(a["Average"]),
                    "Interval Count": int(a["Interval Count"]),
                    "Interval Sum": int(a["Interval Sum"])}})
    assert mngr.get_all_counters_entries() == mine_counters
    assert mngr.get_all_histogram_entries() == mine_hists


@pytest.mark.parametrize("name", SAMPLE_LOGS)
def test_stats_match_reference(reference, name):
    pl = parsed_ref_log(reference, name)
    recs = _mine(fixture_log(name))
    sm = pl.get_stats_mngr()

    ref_cs = []
    for time, te in sm.get_compactions_stats_mngr().get_level_entries().items():
        for cf, ce in te.items():
            for key, vals in ce.items():
                ref_cs.append(
                    (time, cf, key, {k: str(v) for k, v in vals.items()}))
    mine_cs = [(r["ts"], r["cf"], r["name"], r["attrs"])
               for r in recs if r["kind"] == "comp_stats"]
    assert sorted(ref_cs, key=str) == sorted(mine_cs, key=str)

    rl = sm.cf_file_histogram_stats_mngr.get_all_entries() or {}
    ref_rl = []
    for cf, times in rl.items():
        for t, levels in times.items():
            for lv, st in levels.items():
                ref_rl.append((t, cf, lv, st.count, st.average, st.std_dev,
                               st.min, st.median, st.max))
    mine_rl = [(r["ts"], r["cf"], r["value"], int(r["attrs"]["count"]),
                float(r["attrs"]["average"]), float(r["attrs"]["std_dev"]),
                int(r["attrs"]["min"]), float(r["attrs"]["median"]),
                int(r["attrs"]["max"]))
               for r in recs if r["kind"] == "read_latency"]
    assert sorted(ref_rl) == sorted(mine_rl)

    ref_stalls = sm.get_db_wide_stats_mngr().get_stalls_entries()
    mine_stalls = {r["ts"]: r["attrs"] for r in recs
                   if r["kind"] == "db_stats_stall"}
    assert set(ref_stalls.keys()) == set(mine_stalls.keys())
    for t, e in ref_stalls.items():
        m = mine_stalls[t]
        for k, v in e.items():
            if k.endswith("_duration"):
                assert int(v.total_seconds() * 1000) == \
                    int(m[k + "_ms"]), (t, k)
            else:
                assert float(v) == float(m[k]), (t, k)

    # P17: per-cf stall counts == CfNoFileStatsMngr (reasons incl.
    # zeros on kept lines; all-zero lines suppressed by both)
    ref_cf = []
    for cf, times in sm.get_cf_no_file_stats_mngr() \
            .get_stall_counts().items():
        for t, reasons in times.items():
            for reason, count in reasons.items():
                ref_cf.append((t, cf, reason, count))
    mine_cf = [(r["ts"], r["cf"], r["name"], r["value"])
               for r in recs if r["kind"] == "cf_stalls"]
    assert sorted(ref_cf) == sorted(mine_cf)


@pytest.mark.parametrize("name", SAMPLE_LOGS)
def test_warnings_match_reference(reference, name):
    pl = parsed_ref_log(reference, name)
    recs = _mine(fixture_log(name))
    ref = []
    for wtype, cfs in pl.get_warnings_mngr().processed_warnings.items():
        for cf, cats in cfs.items():
            for cat, infos in cats.items():
                for i in infos:
                    ref.append((str(wtype.value), i.time, i.code_pos,
                                i.warning_msg))
    mine = [(r["warn_type"], r["ts"], r["code_pos"], r["msg"])
            for r in recs if r["kind"] == "warning"]
    assert sorted(ref) == sorted(mine)


def test_invalid_log_quarantined():
    recs = _mine("this is not a log\nat all\n")
    assert len(recs) == 1 and recs[0]["kind"] == "quarantine"


def test_baseline_logs_options_match_reference(reference):
    """All 34 shipped version-baseline logs parse to identical options."""
    checked = 0
    for path in BASELINE_LOGS:
        with open(path) as f:
            text = f.read()
        lines = text.splitlines()
        cwd = os.getcwd()
        os.chdir(REFERENCE)
        try:
            pl = reference["log_file"].ParsedLog(path, lines, False)
        except Exception:
            continue  # reference itself rejects -> skip
        finally:
            os.chdir(cwd)
        recs = _mine(text)
        assert _ref_options_dicts(reference, pl) == _options_dicts(recs), path
        checked += 1
    assert checked >= 30


def test_mem_rep_matches_reference(reference):
    """Full memory-report entry vs the reference MemRepParser
    (mem_rep_parser.py:25-160)."""
    import mem_rep_parser  # oracle

    body = [
        "** Memory Reporting **",
        "Arena Stats:",
        "Total: 26M",
        "ArenaWrappedDBIter: 0",
        "HashSpdb: 26M",
        "CF Stats:",
        "Total: 30M",
        "[default]: 20M",
        "[cf1]: 10M",
        "Misc1: 5M",
        "Misc2: 1M",
    ]
    text = ("2023/01/01-00:00:00.000000 1 SpeeDB version: 2.6.0\n"
            "2023/01/01-00:00:00.000001 1 Options.error_if_exists: 0\n"
            "2023/01/01-00:00:00.000002 1 Compression algorithms supported:\n"
            "2023/01/01-00:00:01.000000 7 " + body[0] + "\n"
            + "\n".join(body[1:]) + "\n")

    recs = _mine(text)
    mine = [(r["name"], r["attrs"]["entity"] if r["attrs"] else None,
             r["cf"], r["msg"]) for r in recs if r["kind"] == "memrep"]

    log_entry = reference["log_entry"].LogEntry
    entries, cur = [], None
    for i, line in enumerate(text.splitlines()):
        if log_entry.is_entry_start(line):
            if cur:
                entries.append(cur.all_lines_added())
            cur = log_entry(i, line)
        else:
            cur.add_line(line)
    entries.append(cur.all_lines_added())

    mrp = mem_rep_parser.MemRepParser()
    ok, _ = mrp.try_adding_entries(entries, len(entries) - 1)
    assert ok
    report = list(mrp.get_reports().values())[0]

    expected = [("arena_total", None, None, report.arena_total)]
    expected += [("arena", k, None, v) for k, v in report.arena_stats.items()]
    expected += [("cfs_total", None, None, report.cfs_total)]
    expected += [("cf", None, k, v) for k, v in report.cfs_stats.items()]
    expected += [("misc", k, None, v) for k, v in report.misc_stats.items()]
    assert mine == expected


def test_record_value_order_invariant():
    """engine.parse builds output frames from list(r.values()) — every
    record kind must keep the _rec literal key order with url appended."""
    from log_parser_spark.corpus import load_corpus_logs
    from log_parser_spark.engine.schema import RECORD_FIELDS
    order = [f for f in RECORD_FIELDS if f != "url"] + ["url"]
    for name, text in load_corpus_logs().items():
        for r in parse_document(text):
            r["url"] = "u"
            assert list(r.keys()) == order, (name, list(r.keys()))


def test_oversized_document_quarantined(monkeypatch):
    from log_parser_spark.parsing import document as docmod
    monkeypatch.setattr(docmod.DocumentParser, "MAX_DOC_BYTES", 100)
    recs = docmod.parse_document("x" * 200)
    assert len(recs) == 1
    assert recs[0]["attrs"]["reason"] == "oversized_document"


def test_parse_never_raises_fuzz():
    """Determinism + no-crash on adversarial inputs (hypothesis-style
    corpus of mutations over real log fragments)."""
    import random

    rng = random.Random(7)
    base = fixture_log("LOG_sample").splitlines()
    for trial in range(40):
        n = rng.randrange(1, 60)
        lines = [rng.choice(base) for _ in range(n)]
        # inject garbage
        for _ in range(rng.randrange(0, 5)):
            lines.insert(rng.randrange(len(lines)),
                         rng.choice(["", "\x00\x01garbage",
                                     "2022/13/99-99:99:99.999999 oops",
                                     "EVENT_LOG_v1 {broken json",
                                     "Options.x: " + "y" * 50]))
        text = "\n".join(lines)
        a = parse_document(text)
        b = parse_document(text)
        assert a == b  # deterministic
        assert isinstance(a, list)
