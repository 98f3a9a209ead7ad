"""Property-based CSV byte parity: RANDOM counter/histogram dump
sequences (names appearing/disappearing between dumps, all-zero
counters, zero-count histograms) through the full Spark sink + renderer
path, compared byte-for-byte with the reference csv_outputter."""

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_parser_spark.engine import branches, csv_render, sinks
from log_parser_spark.engine.parse import parse_pages
from log_parser_spark.engine.schema import PAGES_SCHEMA

sys.path.insert(0, "/root/reference")
_CWD = os.getcwd()

_HEADER = ("2023/01/01-00:00:00.000000 1 RocksDB version: 7.7.3\n"
           "2023/01/01-00:00:00.000001 1 Git sha abc\n"
           "2023/01/01-00:00:00.000002 1 DB Session ID:  "
           "P0000000000000000001\n")

NAMES = ["rocksdb.alpha", "rocksdb.beta.total", "rocksdb.gamma"]
HISTS = ["rocksdb.h.one.micros", "rocksdb.h.two.micros"]

# per dump: for each counter, None (absent) or a value; for each
# histogram, None or (count, sum)
DUMPS = st.lists(
    st.tuples(
        st.lists(st.one_of(st.none(), st.integers(0, 50)),
                 min_size=len(NAMES), max_size=len(NAMES)),
        st.lists(st.one_of(st.none(),
                           st.tuples(st.integers(0, 9),
                                     st.integers(0, 500))),
                 min_size=len(HISTS), max_size=len(HISTS))),
    min_size=1, max_size=4)


def _stats_log(dumps):
    lines = [_HEADER.rstrip("\n")]
    for i, (cvals, hvals) in enumerate(dumps):
        body = []
        for name, v in zip(NAMES, cvals):
            if v is not None:
                body.append(f"{name} COUNT : {v}")
        for name, hv in zip(HISTS, hvals):
            if hv is not None:
                cnt, total = hv
                body.append(
                    f"{name} P50 : 1.000000 P95 : 2.000000 P99 : 3.000000 "
                    f"P100 : 4.000000 COUNT : {cnt} SUM : {total}")
        if not body:
            continue
        lines.append(f"2023/01/01-00:01:{i:02d}.000000 1 "
                     f"[/db_impl/db_impl.cc:761] STATISTICS:\n "
                     + "\n ".join(body))
    return "\n".join(lines) + "\n"


def _reference_csvs(text):
    os.chdir("/root/reference")
    try:
        import csv_outputter
        import log_file
        pl = log_file.ParsedLog("p", text.splitlines(), False)
        mngr = pl.get_counters_mngr()
        return (csv_outputter.get_counters_csv(mngr),
                csv_outputter.get_human_readable_histogram_csv(mngr),
                csv_outputter.get_tools_histogram_csv(mngr))
    finally:
        os.chdir(_CWD)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(dumps=DUMPS)
def test_counters_and_histograms_csv_bytes_random(dumps, spark):
    text = _stats_log(dumps)
    ref_counters, ref_hist_human, ref_hist_tools = _reference_csvs(text)

    pages = spark.createDataFrame(
        [("https://t/p", None, None, text, "en")], schema=PAGES_SCHEMA)
    records = parse_pages(pages)
    counter_rows = [r.asDict() for r in sinks.counters_sink(
        branches.counters(records)).collect()]
    hist_rows = [r.asDict() for r in sinks.histograms_sink(
        branches.histograms(records)).collect()]

    assert csv_render.render_counters_csv(counter_rows) == ref_counters
    assert csv_render.render_human_histograms_csv(hist_rows) \
        == ref_hist_human
    assert csv_render.render_tools_histograms_csv(hist_rows) \
        == ref_hist_tools
