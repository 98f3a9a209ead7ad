"""J3 exactness: flow_pairs must reproduce the reference's incremental
matching on PATHOLOGICAL flows (multi-start jobs, repeated finishes) —
a finish binds to the most recent already-seen start of its (job, cf),
later finishes overwrite (events.py:910-931 + 435-460).

The synthetic corpus log carries such flows, so this differential runs
against the reference's own events manager, not hand-written
expectations.
"""

from pyspark.sql import functions as F

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.engine import branches, joins
from log_parser_spark.engine.parse import parse_pages
from log_parser_spark.engine.schema import PAGES_SCHEMA


def _reference_pairs(reference):
    import os
    import sys
    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        import events as rev
        logs = load_corpus_logs()
        pl = reference["log_file"].ParsedLog(
            "synthetic_stats", logs["synthetic_stats"].splitlines(), False)
        em = pl.get_events_mngr()
        out = {}
        for cf in ["default", "cfa"]:
            for s, e in em.get_cf_flow_events(rev.FlowType.FLUSH, cf):
                out[(cf, s.get_job_id(),
                     s.get_time_since_epoch_microseconds())] = (
                    None if e is None
                    else e.get_time_since_epoch_microseconds())
        return out
    finally:
        os.chdir(cwd)


def test_flow_pairs_match_reference_on_pathological_flows(
        spark, reference):
    expected = _reference_pairs(reference)
    assert len(expected) == 6
    # unmatched: superseded multi-start (job 7 s1) + the two tie starts
    assert sum(1 for v in expected.values() if v is None) == 3

    logs = load_corpus_logs()
    pages = spark.createDataFrame(
        [("https://t/synthetic_stats", None, None, logs["synthetic_stats"],
          "en")], schema=PAGES_SCHEMA)
    events = branches.events(parse_pages(pages))
    got = {}
    for r in joins.flow_pairs(events, "Flush").collect():
        got[(r["cf"], r["job_id"], r["start_micros"])] = r["finish_micros"]
    assert got == expected


def test_renderer_flush_pairs_match_reference(reference):
    from log_parser_spark.engine.json_render import View, flush_flow_pairs
    from log_parser_spark.parsing import parse_document

    expected = _reference_pairs(reference)
    logs = load_corpus_logs()
    view = View(parse_document(logs["synthetic_stats"]))
    got = {}
    for cf in ["default", "cfa"]:
        for s, e in flush_flow_pairs(view, cf):
            got[(cf, s["job_id"], s["micros"])] = (
                None if e is None else e["micros"])
    assert got == expected


def test_flush_pairs_query_has_finished_rows(spark):
    """The driver-facing flush-pairs query must carry real finish
    timestamps + durations now that the corpus has finish events."""
    from log_parser_spark.queries import log_flush_pairs
    rows = log_flush_pairs(spark, "unused").collect()
    with_finish = [r for r in rows if r["finish_ts"] is not None]
    assert with_finish, "no finished flush pairs in corpus"
    assert all(r["duration_ms"] >= 0 for r in with_finish)
    unmatched = [r for r in rows if r["finish_ts"] is None]
    assert unmatched, "superseded multi-start flush should stay unmatched"