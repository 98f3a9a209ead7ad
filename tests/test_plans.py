"""Physical-plan regression tests (PLANS.md executable): the properties
that make the engine scale must survive refactors —
predicate pushdown into parquet scans, column pruning, broadcast joins
for dims, exchange reuse in LSH self-joins, and the absence of
cartesian products / global single-partition windows in hot paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def records(spark):
    from log_parser_spark.queries import _records
    return _records(spark)


@pytest.fixture()
def noaqe(spark):
    """Plan strings with AQE disabled show static ReusedExchange nodes;
    with AQE on, the same reuse happens at runtime stage level but is
    invisible in the pre-execution string.  AQE is a runtime-settable
    conf, so toggle it on the shared session and restore."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_branch_scans_push_kind_filter(records):
    from log_parser_spark.engine import branches
    for name, fn in [("counters", branches.counters),
                     ("histograms", branches.histograms),
                     ("events", branches.events),
                     ("options", branches.options)]:
        p = plan(fn(records))
        assert "PushedFilters: [IsNotNull(kind), EqualTo(kind," in p, name


def test_branch_scans_prune_columns(records):
    from log_parser_spark.engine import branches
    p = plan(branches.counters(records))
    # counters never reads the heavy columns
    for heavy in ["attrs_json", "payload_json", "msg"]:
        assert heavy not in p.split("ReadSchema")[-1], heavy


def test_parse_input_prunes_to_url_text(spark, tmp_path):
    from log_parser_spark.corpus import build_pages_df
    from log_parser_spark.engine.parse import parse_pages
    src = str(tmp_path / "pages")
    build_pages_df(spark, 4).write.mode("overwrite").parquet(src)
    p = plan(parse_pages(spark.read.parquet(src)))
    scan = p.split("FileScan")[-1]
    assert "url" in scan and "text" in scan
    assert "html" not in scan  # the binary column never leaves the scan


def test_dim_joins_broadcast_not_shuffle(spark, records):
    from log_parser_spark.engine import enrich
    r = records.select("url", "kind")
    d = enrich.with_domain(r).join(
        F.broadcast(enrich.domain_dim(spark).select("domain", "tier")),
        "domain", "left")
    p = plan(d)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_lsh_self_joins_reuse_exchange(noaqe):
    from log_parser_spark.ops import dedup
    df = noaqe.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1 = plan(dedup.minhash_lsh_pairs(df))
    assert "ReusedExchange" in p1
    p2 = plan(dedup.simhash_pairs(df))
    assert "ReusedExchange" in p2
    # the shingle/minhash pipeline must not be duplicated: at most one
    # non-reused aggregate over the exploded shingles
    assert p1.count("CartesianProduct") == 0
    assert p2.count("CartesianProduct") == 0


def test_ivf_seed_selection_no_global_shuffle(spark):
    """Covered in test_ops for TakeOrdered; here assert the ANN search
    itself has no cartesian product (probe join is a hash join) and the
    corpus-side window is keyed, not global."""
    from log_parser_spark.ops import similarity
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p = plan(similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=3))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_grid_sinks_axis_agg_collapses(records):
    """S3/S4 grids (round-6 shape): nonzero / vals / times all derive
    from ONE (url, ts, name) aggregate behind a lazy localCheckpoint
    barrier, so the whole sink scans the records branch exactly once
    (Catalyst has no cross-join subtree CSE — the old three-frame
    formulation repeated the 23M-row scan + extract three times inside
    the write job).  The barrier surfaces as ExistingRDD/Scan
    ExistingRDD nodes; the records file scan must appear exactly once
    and the grid joins stay broadcast."""
    from log_parser_spark.engine import branches, sinks
    p = plan(sinks.counters_sink(branches.counters(records)))
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastExchange") == 2
    # the barrier appears once per consumer (nonzero / vals / times),
    # all referencing the SAME lazily-checkpointed RDD — computed and
    # persisted once at the write action
    assert p.count("Scan ExistingRDD") == 3, p[:3000]
    # the records parquet scan lives INSIDE the checkpoint RDD's
    # lineage, so the sink's SQL plan itself contains no file scan at
    # all (the old three-frame shape had three)
    import re as _re
    assert not _re.findall(r"FileScan parquet|Scan parquet", p), p[:3000]


def test_quality_tokenizes_once(spark):
    from log_parser_spark.ops import text
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = text.quality_columns(df).select(
        "doc_id", "n_tokens", "stopword_ratio", "quality_score")
    assert plan(q).count("split(") == 1


def test_simhash_single_codegen_branch(spark):
    from log_parser_spark.ops import dedup
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan(dedup.simhash(df))
    assert "Union" not in p          # one path, no per-width branching
    assert p.count("Exchange") <= 3  # repartition + agg, nothing extra


def test_curation_ops_are_map_only(spark):
    """The round-4 curation ops (Gopher quality/repetition, C4 clean,
    PII scrub, sampling keep-filter) must compile to a single
    projection over the scan — no Exchange, no BatchEvalPython — or
    their zero-shuffle 100 TB claim in PLANS.md is broken."""
    from log_parser_spark.ops import cleaning, sampling, text
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    builders = {
        "gopher_quality": lambda: text.gopher_quality_columns(docs),
        "gopher_repetition": lambda: text.gopher_repetition_columns(docs),
        "c4_clean": lambda: cleaning.c4_clean_columns(docs),
        "pii_scrub": lambda: text.redact_pii_columns(docs),
        "sample_filter": lambda: sampling.stratified_sample(
            docs, "lang", {"en": 0.5}, key="doc_id"),
    }
    for name, build in builders.items():
        p = plan(build())
        assert "Exchange" not in p, name
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_bucketed_tables_join_without_exchange(spark, noaqe, tmp_path):
    """Bucketing for co-located joins (north rule): two tables written
    bucketBy(url) with the same bucket count must sort-merge-join with
    ZERO Exchange — at 100 TB this is the difference between a free
    join and shuffling both fact tables."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pyspark.sql import functions as F
        docs = spark.range(200).select(
            F.concat(F.lit("https://d"), (F.col("id") % 37).cast("string"),
                     F.lit(".io/p"), F.col("id").cast("string"))
            .alias("url"),
            F.col("id").alias("v"))
        for name in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (docs.write.bucketBy(8, "url").sortBy("url")
             .option("path", str(tmp_path / name))
             .mode("overwrite").saveAsTable(name))
        j = spark.table("bkt_a").join(
            spark.table("bkt_b").withColumnRenamed("v", "v2"), "url")
        p = plan(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # co-located: no shuffle either side
        assert j.count() == 200  # join actually runs (1:1 on unique urls)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_contamination_probe_is_broadcast(spark, tmp_path):
    """Decontamination scale shape: the eval shingle set must reach the
    train side as a BROADCAST semi-join — the train corpus's shingles
    are never hash-shuffled (at 100 TB that shuffle would dwarf the
    whole job).  Allowed exchanges: the eval-side distinct (benchmark-
    sized) and the final combinable groupBy(doc_id)."""
    import re

    from log_parser_spark.queries_ext import ngram_contamination
    df = ngram_contamination(spark, "/root/testdata/sf0.001")
    p = plan(df)
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 1
    keys = re.findall(r"Exchange hashpartitioning\((\w+)#", p)
    assert set(keys) <= {"doc_id", "h"}, keys


def test_production_records_bucketed_join_without_exchange(
        spark, noaqe, tmp_path):
    """The bucketed-layout evidence applied to the PRODUCTION records
    table: run_pipeline(bucket_records=N) writes records
    bucketBy(N, url).sortBy(url), and the J3 flow-pairs sink join
    (start side x aggregated finish side, keys url+job_id+cf+start_seq)
    then sort-merge-joins with ZERO Exchange — both sides inherit the
    url bucketing, the window and the finish aggregation accept the
    url-subset partitioning outright, and the join accepts it under
    requireAllClusterKeysForCoPartition=false (the 100 TB co-location
    config; subset co-partitioning is always correct, it just clusters
    coarser).  Same contract as
    test_bucketed_tables_join_without_exchange but on the real
    pipeline output, not a toy table."""
    from log_parser_spark.corpus import write_pages_parquet
    from log_parser_spark.engine import branches
    from log_parser_spark.engine.joins import flow_pairs
    from log_parser_spark.engine.pipeline import (records_table_name,
                                                  run_pipeline)
    prev_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_k = spark.conf.get(
        "spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
                   "false")
    out = str(tmp_path / "out")
    table = records_table_name(out, 0)
    try:
        pages = str(tmp_path / "pages")
        write_pages_parquet(spark, pages, 120)
        run_pipeline(spark, out, pages_path=pages, n_buckets=1,
                     sink_names=["files"], bucket_records=8)
        records = spark.table(table)
        j = flow_pairs(branches.events(records), "Flush")
        p = plan(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # co-located end to end
        assert "SelectedBucketsCount: 8 out of 8" in p
        assert j.count() > 0  # the join actually pairs flushes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_b)
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
                       prev_k)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_contamination_explode_is_inline(spark):
    """PLANS.md round-5 rule, Generate side: explode() of a
    previously-projected HOF-built array re-evaluates the array
    construction per OUTPUT row (measured 47 s vs 0.8 s at sf0.1).
    Guard: every Generate in the contamination plan must carry the
    array-CONSTRUCTING expression inline — a bare column reference as
    the generator means the staging-projection shape snuck back in."""
    import re

    from log_parser_spark.queries_ext import ngram_contamination
    df = ngram_contamination(spark, "/root/testdata/sf0.001")
    p = plan(df)
    bare = re.findall(r"Generate explode\(\w+#\d+[L]?\)", p)
    assert not bare, (
        f"explode of a pre-projected array column re-entered the plan "
        f"(re-evaluates the HOF construction per output row): {bare}")
    # the generators that ARE there carry the construction inline
    assert "Generate explode(" in p
    assert p.count("Generate explode(CASE WHEN") >= 1


def test_curation_yield_filter_sits_on_checkpoint_barrier(spark):
    """PLANS.md filter-side rule, curation-funnel instance: pushing the
    three pass flags into a Filter re-inlines every rule's metric HOF
    tree (measured 73 s vs ~3 s at sf1.0 in round 7).  The verdict
    filter must sit on the localCheckpoint barrier, with none of the
    heavy metric constructions above it."""
    from log_parser_spark.queries_ext import curation_yield
    p = plan(curation_yield(spark, "/root/testdata/sf0.001"))
    assert "ExistingRDD" in p, (
        "curation_yield: checkpoint barrier missing — the flag filter "
        "is exposed to predicate pushdown")
    # heavy metric constructions (sorted-bigram fold, line/token HOFs)
    # must be entirely BEHIND the checkpoint; the only expression work
    # above it is the bpe regexp_count and the sampling md5
    for marker in ("array_sort(", "aggregate(filter(", "RLIKE("):
        assert marker not in p, (
            f"curation_yield: {marker} re-inlined above the barrier")


def test_cluster_edges_filter_sits_on_checkpoint_barrier(spark):
    """PLANS.md round-5 rule, filter side: filtering a
    staged-expression column pushes the predicate through the staging
    projections and re-inlines the whole jaccard HOF tree (measured
    49 s vs ~3 s at sf0.1).  Guard: in BOTH cluster queries' edge
    stages the threshold filter must sit directly above the
    localCheckpoint barrier (an ExistingRDD scan), with ZERO
    higher-order-function expressions above it."""
    from log_parser_spark.queries_ext import (_cluster_assignment_edges,
                                              _pipeline_cluster_edges)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(50))
    for builder in (_cluster_assignment_edges, _pipeline_cluster_edges):
        p = plan(builder(spark, docs))
        assert "ExistingRDD" in p, (
            f"{builder.__name__}: checkpoint barrier missing — the "
            f"jaccard plan is exposed to predicate pushdown")
        assert "Filter" in p
        # nothing above the barrier recomputes shingles: the HOF tree
        # must be entirely BEHIND the checkpoint
        for marker in ("transform(", "array_intersect", "xxhash64"):
            assert marker not in p, (
                f"{builder.__name__}: {marker} re-inlined above the "
                f"checkpoint barrier")
