"""End-to-end pipeline tests: records table, sinks, lineage, resume."""

import json
import os

import pytest

from log_parser_spark.corpus import write_pages_parquet
from log_parser_spark.engine.pipeline import processed_buckets, run_pipeline


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages")
    write_pages_parquet(spark, path, 48)
    return path


def test_pipeline_end_to_end(spark, pages_path, tmp_path):
    out = str(tmp_path / "out")
    m = run_pipeline(spark, out, pages_path=pages_path, n_buckets=2)
    assert len(m["buckets"]) == 2
    assert m["rows_out"]["records"] > 1000
    assert m["rows_out"]["parsed_meta"] == 48  # every page has metadata
    # routed sinks carry rows (the corpus embeds stats/events logs)
    assert m["rows_out"]["counters_csv"] > 0
    assert m["rows_out"]["compaction_stats"] > 0
    # lineage carries split ids + row counts
    lin = os.path.join(out, "_lineage")
    rows = [json.loads(open(os.path.join(lin, f)).read())
            for f in sorted(os.listdir(lin))]
    assert all(r["rows_in"] > 0 and r["splits"] for r in rows)
    assert sum(r["rows_in"] for r in rows) == 48
    # the audit can tell the exact footer count from the approximate
    # accumulator count (splits path -> exact)
    assert all(r["rows_in_method"] == "split_footers" for r in rows)


def test_pipeline_resume_skips_done(spark, pages_path, tmp_path):
    out = str(tmp_path / "out")
    run_pipeline(spark, out, pages_path=pages_path, n_buckets=3,
                 sink_names=["quarantine"])
    assert processed_buckets(spark, out) == {0, 1, 2}

    # nothing pending -> no work
    m = run_pipeline(spark, out, pages_path=pages_path, n_buckets=3,
                     sink_names=["quarantine"], resume=True, epoch=1)
    assert m["buckets"] == []

    # lose bucket 1's lineage -> only bucket 1 reruns
    os.remove(os.path.join(out, "_lineage", "bucket-1-epoch-0.json"))
    m = run_pipeline(spark, out, pages_path=pages_path, n_buckets=3,
                     sink_names=["quarantine"], resume=True, epoch=2)
    assert [b["bucket"] for b in m["buckets"]] == [1]


def test_resume_guards_against_changed_bucketing(spark, pages_path,
                                                 tmp_path):
    """A lineage row from a different n_buckets, or whose recorded
    split set no longer matches the bucket's membership, must NOT mark
    the bucket done (documents would be skipped or double-processed)."""
    out = str(tmp_path / "out")
    run_pipeline(spark, out, pages_path=pages_path, n_buckets=2,
                 sink_names=["quarantine"])

    # same splits, different n_buckets -> everything reprocessed
    m = run_pipeline(spark, out, pages_path=pages_path, n_buckets=3,
                     sink_names=["quarantine"], resume=True, epoch=1)
    assert [b["bucket"] for b in m["buckets"]] == [0, 1, 2]

    # changed split membership (e.g. new input files landed) -> the
    # recorded split set no longer matches and the bucket is not done
    assert processed_buckets(spark, out, n_buckets=2) == {0, 1}
    done = processed_buckets(
        spark, out, n_buckets=2,
        current_splits={0: ["not-the-same#0"], 1: ["neither#0"]})
    assert done == set()


def test_pipeline_disjoint_shard_workers(spark, pages_path, tmp_path):
    """Multi-process scale-out: two 'workers' each own a disjoint
    bucket subset (only_buckets); their union equals a single full run
    — same records rows, complete lineage, and resume sees all done."""
    out_sharded = str(tmp_path / "sharded")
    m1 = run_pipeline(spark, out_sharded, pages_path=pages_path,
                      n_buckets=4, only_buckets=[0, 1],
                      sink_names=["quarantine"])
    m2 = run_pipeline(spark, out_sharded, pages_path=pages_path,
                      n_buckets=4, only_buckets=[2, 3],
                      sink_names=["quarantine"])
    assert [b["bucket"] for b in m1["buckets"]] == [0, 1]
    assert [b["bucket"] for b in m2["buckets"]] == [2, 3]
    assert processed_buckets(spark, out_sharded) == {0, 1, 2, 3}

    out_full = str(tmp_path / "full")
    mf = run_pipeline(spark, out_full, pages_path=pages_path,
                      n_buckets=4, sink_names=["quarantine"])
    assert (m1["rows_out"]["records"] + m2["rows_out"]["records"]
            == mf["rows_out"]["records"])
    sharded = spark.read.parquet(os.path.join(out_sharded, "records"))
    full = spark.read.parquet(os.path.join(out_full, "records"))
    assert sharded.count() == full.count()
    assert sharded.select("url").distinct().count() == 48

    # a third worker asked for already-done buckets does nothing
    m3 = run_pipeline(spark, out_sharded, pages_path=pages_path,
                      n_buckets=4, only_buckets=[1, 2], resume=True,
                      epoch=1, sink_names=["quarantine"])
    assert m3["buckets"] == []


def test_pipeline_hash_bucket_mode_lineage_method(spark, pages_path,
                                                  tmp_path):
    """DataFrame-source mode buckets by url hash and counts rows_in via
    an accumulator; the lineage row must disclose that the count is the
    approximate accumulator method (re-applied on task retries), not
    the exact split_footers count."""
    out = str(tmp_path / "out_hash")
    pages = spark.read.parquet(pages_path)
    m = run_pipeline(spark, out, pages=pages, n_buckets=2,
                     sink_names=["quarantine"])
    assert len(m["buckets"]) == 2
    assert all(b["rows_in_method"] == "accumulator" for b in m["buckets"])
    # no retries in a healthy local run -> accumulator count is exact
    assert sum(b["rows_in"] for b in m["buckets"]) == 48


def test_bucketed_records_fresh_session(spark, pages_path, tmp_path):
    """Fresh-session recovery of the bucketed records layout (round-5
    VERDICT item 6): saveAsTable registrations live in the writing
    session's metastore, so a consumer in a NEW session (separate
    derby/warehouse — here: a subprocess with its own cwd) must be able
    to rebuild the table from the on-disk _bucket_spec.json via
    register_records_table, read identical rows, AND keep the
    Exchange-free co-located join plan (bucket ids come from the
    _000NN file-name suffixes, which survive re-registration)."""
    import subprocess
    import sys

    out = str(tmp_path / "out")
    m = run_pipeline(spark, out, pages_path=pages_path, n_buckets=1,
                     sink_names=["files"], bucket_records=8)
    n_records = m["rows_out"]["records"]
    assert n_records > 0

    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from log_parser_spark.engine.session import get_spark
from log_parser_spark.engine.pipeline import (records_table_name,
                                              register_records_table)
from log_parser_spark.engine import branches
from log_parser_spark.engine.joins import flow_pairs
spark = get_spark(app_name="fresh", cores=4, shuffle_partitions=4,
                  extra_conf={{
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.requireAllClusterKeysForCoPartition": "false"}})
name = records_table_name({out!r}, 0)
assert not spark.catalog.tableExists(name), "expected a FRESH metastore"
table = register_records_table(spark, {out!r}, 0)
records = spark.table(table)
assert records.count() == {n_records}, "row mismatch after re-register"
j = flow_pairs(branches.events(records), "Flush")
p = j._jdf.queryExecution().executedPlan().toString()
assert "SortMergeJoin" in p, p[:2000]
assert "Exchange" not in p, p[:2000]
assert "SelectedBucketsCount: 8 out of 8" in p, p[:2000]
assert j.count() > 0
print("FRESH-SESSION-OK")
"""
    work = tmp_path / "fresh_cwd"
    work.mkdir()
    r = subprocess.run([sys.executable, "-c", script], cwd=str(work),
                       capture_output=True, text=True, timeout=600,
                       env={**os.environ, "SPARK_GRAFT_CPUS": "4"})
    assert r.returncode == 0, r.stderr[-3000:]
    assert "FRESH-SESSION-OK" in r.stdout
