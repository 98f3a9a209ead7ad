"""End-to-end byte parity: pages -> mapInPandas parse -> routed sinks ->
per-url CSV render  ==  reference csv_outputter on the same log text.

This is the north-rule correctness gate (per-sink counts AND routed-row
set equality) asserted at its strongest form: byte equality.
"""

import pytest
from pyspark.sql import functions as F

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.engine import branches, csv_render, sinks
from log_parser_spark.engine.parse import parse_pages
from log_parser_spark.engine.schema import PAGES_SCHEMA

import glob as _glob
import os as _os

CORPUS_IDS = ["sample", "sample_stats", "rolled", "synthetic_stats"] + \
    sorted(_os.path.basename(p) for p in
           _glob.glob("/root/reference/baseline_logs/LOG-*"))


@pytest.fixture(scope="module")
def routed(spark):
    logs = load_corpus_logs()
    rows = [(f"https://t/{cid}", None, None, logs[cid], "en")
            for cid in CORPUS_IDS]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    records = parse_pages(pages).persist()

    def collect_per_url(df):
        out = {}
        for row in df.collect():
            d = row.asDict(recursive=True)
            out.setdefault(d["url"], []).append(d)
        return out

    events = branches.events(records)
    cf_reg = branches.cf_registry(records)
    data = {
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
    records.unpersist()
    return data


@pytest.fixture(scope="module")
def oracles(reference):
    import os
    logs = load_corpus_logs()
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        REF_ASSERTS = "__REF_ASSERTS__"

        def guarded(fn, *args):
            try:
                return fn(*args)
            except AssertionError:
                return REF_ASSERTS

        out = {"__marker__": REF_ASSERTS}
        for cid in CORPUS_IDS:
            pl = reference["log_file"].ParsedLog(
                cid, logs[cid].splitlines(), False)
            co = reference["csv_outputter"]
            mngr = pl.get_counters_mngr()
            out[cid] = {
                "counters": guarded(co.get_counters_csv, mngr),
                "histograms_human": guarded(
                    co.get_human_readable_histogram_csv, mngr),
                "histograms_tools": guarded(co.get_tools_histogram_csv, mngr),
                "comp_stats": guarded(
                    co.get_compaction_stats_csv,
                    pl.get_stats_mngr().get_compactions_stats_mngr()),
                "flushes": guarded(
                    co.get_flushes_csv,
                    pl.get_cfs_names(include_auto_generated=False),
                    pl.get_events_mngr()),
                "compactions": guarded(co.get_compactions_csv,
                                       pl.get_compactions_monitor()),
                "files": guarded(co.get_files_csv, pl.get_files_monitor()),
            }
        return out
    finally:
        os.chdir(cwd)


def _url(cid):
    return f"https://t/{cid}"


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_counters_csv_bytes(routed, oracles, cid):
    mine = csv_render.render_counters_csv(
        routed["counters"].get(_url(cid), []))
    assert mine == oracles[cid]["counters"]


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_histograms_human_csv_bytes(routed, oracles, cid):
    mine = csv_render.render_human_histograms_csv(
        routed["histograms"].get(_url(cid), []))
    assert mine == oracles[cid]["histograms_human"]


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_histograms_tools_csv_bytes(routed, oracles, cid):
    mine = csv_render.render_tools_histograms_csv(
        routed["histograms"].get(_url(cid), []))
    assert mine == oracles[cid]["histograms_tools"]


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_compaction_stats_csv_bytes(routed, oracles, cid):
    mine = csv_render.render_compaction_stats_csv(
        routed["comp_stats"].get(_url(cid), []))
    assert mine == oracles[cid]["comp_stats"]


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_flushes_csv_bytes(routed, oracles, cid):
    mine = csv_render.render_flushes_csv(routed["flushes"].get(_url(cid), []))
    assert mine == oracles[cid]["flushes"]


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_compactions_csv_bytes(routed, oracles, cid):
    mine = csv_render.render_compactions_csv(
        routed["compactions"].get(_url(cid), []))
    assert mine == oracles[cid]["compactions"]


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_files_csv_bytes(routed, oracles, cid):
    expected = oracles[cid]["files"]
    if expected == oracles["__marker__"]:
        with pytest.raises(csv_render.FilesHeaderMismatch):
            csv_render.render_files_csv(routed["files"].get(_url(cid), []))
    else:
        mine = csv_render.render_files_csv(
            routed["files"].get(_url(cid), []))
        assert mine == expected
