#!/usr/bin/env python
"""Extra benchmark / profiling harness for optimization round 7.

NOT the driver contract (that is bench.py, frozen): this tool times
individual queries with the noop sink (guide §1.4), captures
.explain("formatted") plans into plans/r07/, and breaks the expensive
composite queries (dedup_pipeline_clusters) into stages so the
superlinear part is identified by measurement, not guesswork.

Usage:
  python bench_extra.py queries [name ...]   # time queries (noop), best-of-N
  python bench_extra.py plans [name ...]     # dump plans to plans/r07/
  python bench_extra.py stages               # stage-level profile of
                                             # dedup_pipeline_clusters
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_LEGS (default 3),
     PLANS_SUFFIX (default "before": plans/r07/<q>_<suffix>.txt)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from log_parser_spark.engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LEGS = int(os.environ.get("BENCH_EXTRA_LEGS", "3"))

DEFAULT_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_volume",
    "events_route_counts", "events_asof_signup", "orders_running_sum",
    "dedup_exact_docs", "token_stats_by_lang", "bpe_token_stats",
    "doc_quality", "minhash_pairs", "simhash_docs", "embedding_topk",
    "embedding_topk_arrow", "embedding_ann_ivf", "media_frame_stats",
    "log_growth_total", "log_parsed_json_report",
    "gopher_quality", "gopher_repetition", "pii_scrub", "c4_clean",
    "stratified_sample_mix", "ngram_contamination",
    "temperature_mix_weights", "dedup_cluster_assignment",
    "dedup_pipeline_clusters",
]


def _spark():
    return get_spark(app_name="bench_extra", cores=CPUS,
                     shuffle_partitions=CPUS)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def time_queries(names):
    from log_parser_spark import queries as Q
    spark = _spark()
    out = {}
    for name in names:
        legs = []
        for _ in range(LEGS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t = time.time()
            noop(Q.QUERIES[name](spark, SF_DIR))
            legs.append(round(time.time() - t, 3))
        out[name] = {"min": min(legs), "legs": legs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": {
        k: v["min"] for k, v in out.items()}}))


def dump_plans(names, suffix=None):
    from log_parser_spark import queries as Q
    suffix = suffix or os.environ.get("PLANS_SUFFIX", "before")
    spark = _spark()
    os.makedirs("plans/r07", exist_ok=True)
    for name in names:
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = f"plans/r07/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


def stages_dedup_pipeline():
    """Break dedup_pipeline_clusters into measured stages at SF_DIR."""
    from log_parser_spark.ops import dedup
    from log_parser_spark.queries_ext import _pipeline_cluster_edges
    spark = _spark()
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    g = F.floor(F.col("doc_id") / 25).cast("long")
    k = F.pmod("doc_id", F.lit(25))
    start = k.cast("long") * 12
    win = F.array_join(F.transform(
        F.sequence(start + 1, start + 60),
        lambda j: F.concat(F.lit("g"), g.cast("string"),
                           F.lit("_t"), j.cast("string"))), " ")
    planted = docs.withColumn(
        "text", F.when(k <= 4, win).otherwise(F.col("text")))

    res = {}

    def leg(label, fn):
        t = time.time()
        out = fn()
        res[label] = {"sec": round(time.time() - t, 3), "out": out}
        print(json.dumps({label: res[label]}), flush=True)

    # stage 1: LSH candidate generation alone
    spark.sparkContext.setJobDescription("stage: lsh candidates")
    leg("lsh_candidates", lambda: (
        dedup.minhash_lsh_pairs(planted, num_perm=16, bands=16)
        .select("a", "b").count()))

    # stage 2: candidates -> text join -> jaccard verify -> edges
    spark.sparkContext.setJobDescription("stage: edges (verify)")
    leg("edges_total", lambda: _pipeline_cluster_edges(
        spark, planted).count())

    # stage 3: full query (edges + CC)
    spark.sparkContext.setJobDescription("stage: full query incl CC")
    def full():
        edges = _pipeline_cluster_edges(spark, planted)
        out = dedup.connected_components(edges, max_iters=20).select(
            F.col("node").alias("doc_id"), "component", "cluster_size")
        noop(out)
        return None
    leg("full_query", full)

    print(json.dumps({"sf_dir": SF_DIR, "stages": {
        k: v["sec"] for k, v in res.items()}}))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if mode == "queries":
        time_queries(names)
    elif mode == "plans":
        dump_plans(names)
    elif mode == "stages":
        stages_dedup_pipeline()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
