"""Structured Streaming variant: availableNow drain + exactly-once
file-source progress via checkpoint."""

import os

from log_parser_spark.corpus import write_pages_parquet
from log_parser_spark.engine.streaming import stream_pipeline


def test_stream_pipeline_available_now(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_pages_parquet(spark, pages, 24)

    q = stream_pipeline(spark, pages, out, ckpt)
    q.awaitTermination(300)
    assert not q.isActive

    counters = spark.read.parquet(os.path.join(out, "counters_csv"))
    assert counters.count() >= 0  # schema exists; rows depend on batch mix
    records = spark.read.parquet(os.path.join(out, "records"))
    n_first = records.count()
    assert n_first > 500

    # second run with same checkpoint: nothing new -> no extra batches
    batches_before = set(os.listdir(os.path.join(out, "records")))
    q2 = stream_pipeline(spark, pages, out, ckpt)
    q2.awaitTermination(120)
    batches_after = set(os.listdir(os.path.join(out, "records")))
    assert batches_before == batches_after


def test_stream_sinks_equal_batch_sinks(spark, tmp_path):
    """Streaming/batch parity (the streaming analogue of the resume
    test): on the SAME pages corpus, the union of the stream's
    per-batch sink outputs must equal the batch pipeline's sinks as a
    multiset, and the stream's records table must carry exactly the
    batch pipeline's rows.  Every sink is per-url-local, so batch
    boundaries (file-source micro-batches) must not change any output
    row — if a sink ever grew cross-document state this test catches
    the stream/batch fork immediately."""
    from log_parser_spark.engine.pipeline import run_pipeline
    from log_parser_spark.engine.streaming import STREAM_SINKS

    pages = str(tmp_path / "pages")
    write_pages_parquet(spark, pages, 24)

    bout = str(tmp_path / "batch_out")
    run_pipeline(spark, bout, pages_path=pages, n_buckets=1,
                 sink_names=[s for s in STREAM_SINKS if s != "quarantine"])

    sout = str(tmp_path / "stream_out")
    q = stream_pipeline(spark, pages, sout, str(tmp_path / "ckpt"),
                        max_files_per_trigger=2)
    q.awaitTermination(300)
    assert not q.isActive
    # multiple micro-batches, or the parity claim is vacuous
    n_batches = len([d for d in os.listdir(os.path.join(sout, "records"))
                     if d.startswith("batch=")])
    assert n_batches >= 2, n_batches

    def rows(path):
        # drop the partition-layout column (batch=N vs bucket=N) —
        # the only legitimate difference between the two pipelines
        df = spark.read.parquet(path).drop("bucket", "batch")
        return sorted(df.toJSON().collect())

    # records parity: same parsed rows regardless of batching (seq is
    # assigned per parse call and page-local, so it is comparable too)
    assert rows(os.path.join(bout, "records")) == \
        rows(os.path.join(sout, "records"))

    for sink in STREAM_SINKS:
        if sink == "quarantine":  # batch side ran without it; records
            continue              # parity above covers its inputs
        b = rows(os.path.join(bout, sink))
        s = rows(os.path.join(sout, sink))
        assert b == s, f"{sink}: stream/batch outputs differ"


def test_watermarked_window_counts(spark, tmp_path):
    """Event-time windowed agg with watermark over a bounded stream."""
    import datetime as dt

    from log_parser_spark.engine.streaming import (
        watermarked_event_window_counts)

    src = str(tmp_path / "events")
    base = dt.datetime(2023, 1, 1, 10, 0, 0)
    rows = [(base + dt.timedelta(seconds=s), t)
            for s in (0, 10, 70, 80, 130) for t in ("click", "view")]
    spark.createDataFrame(rows, "ts timestamp, event_type string") \
        .write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema("ts timestamp, event_type string")
              .parquet(src))
    agg = watermarked_event_window_counts(stream, window="1 minute",
                                          watermark="2 minutes")
    q = (agg.writeStream.format("memory").queryName("wincounts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["window"]["start"].minute, r["event_type"]): r["n"]
           for r in spark.sql("select * from wincounts").collect()}
    # 10:00 window has 2 events per type, 10:01 has 2, 10:02 has 1
    assert got[(0, "click")] == 2 and got[(1, "click")] == 2 \
        and got[(2, "click")] == 1
    assert got[(0, "view")] == 2


def test_stateful_flow_pairs_across_batches(spark, tmp_path):
    """applyInPandasWithState: pairing state must survive micro-batch
    boundaries — starts arrive in batch 1 (file 1), finishes in batch 2
    (file 2, maxFilesPerTrigger=1)."""
    from log_parser_spark.engine.streaming import stateful_flow_pairs_stream

    src = str(tmp_path / "flows")
    os.makedirs(src)
    schema = ("url string, job_id long, cf string, seq long, "
              "event_type string, time_micros long")
    starts = [("u1", 7, "default", 1, "start", 1_000_000),
              ("u1", 7, "default", 2, "start", 2_000_000),  # overwrites
              ("u1", 8, "cfa", 3, "start", 3_000_000)]
    finishes = [("u1", 7, "default", 10, "finish", 5_000_000),
                ("u1", 8, "cfa", 11, "finish", 9_000_000),
                ("u1", 9, "cfx", 12, "finish", 9_500_000)]  # no start
    spark.createDataFrame(starts, schema).coalesce(1) \
        .write.parquet(src + "/a")
    spark.createDataFrame(finishes, schema).coalesce(1) \
        .write.parquet(src + "/b")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    pairs = stateful_flow_pairs_stream(stream)
    q = (pairs.writeStream.format("memory").queryName("flowpairs")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["job_id"], r["cf"]): (r["start_seq"], r["finish_seq"],
                                    r["duration_ms"])
           for r in spark.sql("select * from flowpairs").collect()}
    # job 7: finish binds the MOST RECENT start (seq 2), state crossed
    # the batch boundary; job 9's finish had no start -> no row
    assert got == {(7, "default"): (2, 10, 3000),
                   (8, "cfa"): (3, 11, 6000)}


def test_streaming_exact_dedup(spark, tmp_path):
    """Watermark-bounded streaming dedup: replays of the same content
    within the horizon are dropped ACROSS micro-batches; first arrival
    wins."""
    import datetime as dt

    from log_parser_spark.engine.streaming import streaming_exact_dedup

    src = str(tmp_path / "docs")
    base = dt.datetime(2023, 1, 1, 10, 0, 0)
    rows = [
        (1, "alpha doc", base),
        (2, "beta doc", base + dt.timedelta(seconds=5)),
        (3, "alpha doc", base + dt.timedelta(seconds=30)),   # replay
        (4, "gamma doc", base + dt.timedelta(seconds=40)),
        (5, "beta doc", base + dt.timedelta(seconds=50)),    # replay
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts timestamp")
    # two files -> the file stream delivers multiple micro-batches with
    # maxFilesPerTrigger=1, so dedup state must carry across batches
    df.filter("doc_id <= 2").coalesce(1).write.mode("overwrite").parquet(src)
    df.filter("doc_id > 2").coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream
              .schema("doc_id long, text string, ingest_ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_exact_dedup(stream, ts_col="ingest_ts",
                                watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dedupstream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {r["doc_id"] for r in
           spark.sql("select doc_id from dedupstream").collect()}
    assert 1 in got or 3 in got          # exactly one 'alpha doc'
    assert not ({1, 3} <= got)
    assert 2 in got or 5 in got          # exactly one 'beta doc'
    assert not ({2, 5} <= got)
    assert 4 in got                      # unique doc survives


def test_streaming_curation_pass(spark, tmp_path):
    """The curation ops are stateless projections, so they compose with
    Structured Streaming unchanged: a file-source stream of documents
    driven through Gopher quality + PII redaction + the deterministic
    sample filter, drained with availableNow — the streamed results
    must equal the batch run row-for-row."""
    from pyspark.sql import functions as F

    from log_parser_spark.ops import sampling, text

    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt_cur")
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick brown fox email me at a"),
                 F.col("id").cast("string"),
                 F.lit("@b.co and that is all of it with some more "
                       "words to have enough here today")).alias("text"))
    docs.write.mode("overwrite").parquet(src)

    def curate(df):
        q = text.gopher_quality_columns(text.redact_pii_columns(df))
        return sampling.deterministic_sample(
            q.select("doc_id", "n_words", "n_emails", "redacted_text"),
            key="doc_id", fraction=0.5, seed=3)

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    q = (curate(stream).writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    streamed = {(r["doc_id"], r["n_words"], r["n_emails"],
                 r["redacted_text"])
                for r in spark.read.parquet(out).collect()}
    batch = {(r["doc_id"], r["n_words"], r["n_emails"], r["redacted_text"])
             for r in curate(spark.read.parquet(src)).collect()}
    assert streamed == batch and len(batch) > 50
    assert all("<EMAIL>" in t for _, _, _, t in batch)
