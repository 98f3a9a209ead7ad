"""Aggregate-layer differential tests vs the reference calc layer."""

import pytest
from pyspark.sql import functions as F

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.engine import aggregates as A
from log_parser_spark.engine import branches, enrich
from log_parser_spark.engine.parse import parse_pages
from log_parser_spark.engine.schema import PAGES_SCHEMA
from log_parser_spark.engine.summary import parsed_json_sink
from tests.conftest import parsed_ref_log


@pytest.fixture(scope="module")
def records(spark):
    logs = load_corpus_logs()
    rows = [(f"https://t/{cid}", None, None, logs[cid], "en")
            for cid in ["sample", "rolled", "sample_stats"]]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    rec = parse_pages(pages)
    rec.persist().count()
    yield rec
    rec.unpersist()


def test_event_histogram_matches_reference(reference, records):
    ev = branches.events(records)
    mine = {(r["url"], r["cf"], r["event_type"]): r["n"]
            for r in A.event_histogram(ev).collect()}

    fixture_names = {"sample": "LOG_sample", "rolled": "Rolled_LOG_sample.txt"}
    for cid, fixture in fixture_names.items():
        pl = parsed_ref_log(reference, fixture)
        ref = {}
        for job_events in pl.get_events_mngr().debug_get_all_events().values():
            for cf, types in job_events.items():
                for t, evs in types.items():
                    key = (f"https://t/{cid}", cf, str(t))
                    ref[key] = ref.get(key, 0) + len(evs)
        mine_cid = {k: v for k, v in mine.items() if k[0].endswith(cid)}
        assert ref == mine_cid, cid


def test_db_size_start_end(records, reference):
    cs = branches.comp_stats(records)
    out = {r["url"]: (r["db_size_bytes_at_start"], r["db_size_bytes_at_end"])
           for r in A.db_size_start_end(cs).collect()}
    # the sample logs carry exactly one stats dump -> start == end
    for url, (s, e) in out.items():
        assert s == e and s > 0


def test_compression_and_filter_stats(records):
    ev = branches.events(records)
    comp = A.compression_stats(ev).collect()
    assert all(r["n_files"] > 0 for r in comp)
    filt = A.filter_stats(ev).collect()
    assert all(r["avg_bpk"] >= 0 for r in filt)


def test_flush_stats_and_histogram(records):
    ev = branches.events(records)
    fs = A.flush_stats(ev).collect()
    assert all(r["n_flushes"] > 0 for r in fs)
    hist = A.flush_size_histogram(ev).collect()
    assert all(
        sum(r[c] for c in ["lt_2mb", "mb_2_10", "mb_10_32", "mb_32_64",
                           "gt_64mb"]) > 0 for r in hist)


def test_running_live_size_non_negative_final(records):
    ev = branches.events(records)
    for r in A.running_live_size(ev).collect():
        assert r["max_live_size"] >= r["final_live_size"]


def test_warnings_rollup(records, spark):
    from log_parser_spark.engine import sinks
    w = sinks.warnings_sink(branches.warnings(records),
                            branches.cf_registry(records))
    roll = A.warnings_counts(w).collect()
    # rollup includes the per-url grand total row (nulls in sub-keys)
    totals = [r for r in roll if r["warn_type"] is None]
    assert totals and all(r["n"] >= 1 for r in totals)


def test_enrichment_broadcast_joins(records, spark):
    ev = enrich.enrich_events(branches.events(records), spark)
    rows = ev.select("event_type", "sink", "domain", "tier").collect()
    assert all(r["sink"] is not None for r in rows)
    assert all(r["domain"] == "t" for r in rows)  # test urls host is "t"

    from log_parser_spark.engine import sinks
    w = sinks.warnings_sink(branches.warnings(records),
                            branches.cf_registry(records))
    we = enrich.enrich_warnings(w, spark)
    assert all(r["severity"] is not None for r in we.collect())


def test_parsed_json_summary(records, spark):
    out = parsed_json_sink(records, spark)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 3
    sample = rows["https://t/sample"]
    assert sample["product_name"] == "SpeeDB"
    assert sample["version"] == "6.22.1"
    assert sample["summary_json"].startswith("{")
    assert sample["db_size_bytes_at_start"] is not None


def test_read_density_synthetic(spark):
    # two levels: level 0 holds 10% of bytes but 50% of reads -> much
    # denser than level 1 (calc_utils.py:866-932 semantics)
    rl = spark.createDataFrame(
        [("u", "cf1", 0, 50, 0), ("u", "cf1", 1, 50, 1)],
        "url string, cf string, level long, count long, seq long")
    cs = spark.createDataFrame(
        [("u", "t0", "cf1", "LEVEL-0", {"size_bytes": "100"}, 0),
         ("u", "t0", "cf1", "LEVEL-1", {"size_bytes": "900"}, 1),
         ("u", "t0", "cf1", "SUM", {"size_bytes": "1000"}, 2)],
        "url string, ts string, cf string, level_key string, "
        "attrs map<string,string>, seq long")
    out = {r["level"]: r for r in
           A.read_density_per_level(cs, rl).collect()}
    assert out[0]["density"] == 5.0 and out[1]["density"] == \
        pytest.approx(0.5556, abs=1e-3)
    assert out[0]["weighted_density"] + out[1]["weighted_density"] == \
        pytest.approx(1.0)


def test_block_cache_assembly(records):
    out = A.block_cache_assembly(
        branches.block_cache(records),
        branches.counters(records)).collect()
    assert out
    for r in out:
        assert r["capacity"] > 0
        assert r["cache_counters"] is None or \
            all(k.startswith("rocksdb.block.cache.")
                for k in r["cache_counters"])
