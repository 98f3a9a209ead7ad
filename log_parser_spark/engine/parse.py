"""The parse stage: pages DataFrame -> records DataFrame.

``mapInArrow`` is the one Python hop in the pipeline (input_hint:
vectorized Arrow UDFs, no per-row Python UDFs): input batches are
consumed as Arrow RecordBatches and output batches are BUILT as Arrow
directly (~2.5x cheaper than the pandas-frame path).  State is strictly
per document, so the stage is embarrassingly parallel across urls; the
explicit ``select("url", "text")`` before the map guarantees column
pruning reaches the scan (the html binary column is never read).
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401 (annotations)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_parser_spark.engine.schema import RECORDS_SCHEMA
from log_parser_spark.parsing.document import (DocumentParser,
                                               parse_document,
                                               parse_document_stream)

# Bound the size of each output Arrow batch (records per yielded frame).
_OUT_CHUNK = 20_000


def _doc_record_batches(text: str):
    """Record batches for one document.  Oversized documents go through
    the streaming parser (lazy entry segmentation + incremental record
    flushes) so a single multi-hundred-MB document can't OOM a worker;
    normal documents use the faster eager path."""
    if len(text) > DocumentParser.LAZY_DOC_BYTES:
        yield from parse_document_stream(text, flush_every=_OUT_CHUNK * 5)
    else:
        yield parse_document(text)


_ARROW_SCHEMA = None


def _records_arrow_schema():
    global _ARROW_SCHEMA
    if _ARROW_SCHEMA is None:
        from pyspark.sql.pandas.types import to_arrow_schema
        _ARROW_SCHEMA = to_arrow_schema(RECORDS_SCHEMA)
    return _ARROW_SCHEMA


def _arrow_batch_from_records(buf: list[dict]):
    """Records -> pa.RecordBatch directly: ~2.5x cheaper than the
    pandas-frame path (which pays an object-dtype frame build AND the
    worker's pandas->arrow conversion).

    Round 7: RecordBatch.from_pylist instead of a Python-level
    transpose (list(r.values()) per record + zip) — the dict-of-lists
    build ran in interpreted Python and was ~2/3 of the batch cost;
    from_pylist walks the dicts in Arrow's C++ conversion path and
    measures 3x faster per 20k-record chunk (75 -> 25 ms), with a
    byte-identical batch.  It also matches fields BY NAME, which is
    strictly safer than the old positional zip against a fixed
    key-order list."""
    import pyarrow as pa
    return pa.RecordBatch.from_pylist(buf, schema=_records_arrow_schema())


def _parse_batches(batches) -> "Iterator[pa.RecordBatch]":
    buf: list[dict] = []
    for rb in batches:
        for url, text in zip(rb.column("url").to_pylist(),
                             rb.column("text").to_pylist()):
            for recs in _doc_record_batches(
                    text if isinstance(text, str) else ""):
                for r in recs:
                    r["url"] = url
                buf.extend(recs)
                while len(buf) >= _OUT_CHUNK:
                    yield _arrow_batch_from_records(buf[:_OUT_CHUNK])
                    buf = buf[_OUT_CHUNK:]
    if buf:
        yield _arrow_batch_from_records(buf)


def parse_pages(pages: DataFrame, repartition: int | None = None,
                rows_in_acc=None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> records DataFrame.

    rows_in_acc: optional SparkContext accumulator — incremented by the
    number of input pages as batches stream through, so callers get the
    input count for free with the parse action instead of paying a
    separate count() job (task retries could over-count; callers
    needing an exact number on a flaky cluster should count the source
    — the pipeline's scale path uses parquet footers instead)."""
    cols = pages.select("url", "text")
    if repartition:
        # spread documents evenly; hot domains are broken up because the
        # hash key is the full url, not the domain
        cols = cols.repartition(repartition, F.xxhash64("url"))
    fn = _parse_batches
    if rows_in_acc is not None:
        def fn(batches):
            def counted(bs):
                for rb in bs:
                    rows_in_acc.add(rb.num_rows)
                    yield rb
            yield from _parse_batches(counted(batches))
    return cols.mapInArrow(fn, schema=RECORDS_SCHEMA)


def parquet_splits(path: str) -> list[tuple[str, int, int]]:
    """(file, row_group, n_rows) split descriptors for a parquet dir."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    splits = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            splits.append((f, rg, md.row_group(rg).num_rows))
    return splits


def parse_splits(spark, splits: list[tuple[str, int, int]]) -> DataFrame:
    """Parse an explicit list of (file, row_group, n_rows) splits — the
    checkpoint/lineage unit of the pipeline."""
    if not splits:
        raise ValueError("no splits")
    rdd = spark.sparkContext.parallelize(splits, len(splits))
    desc = spark.createDataFrame(rdd, "path string, rg int, n_rows int")
    return desc.mapInArrow(_parse_split_batches, schema=RECORDS_SCHEMA)


def _parse_split_batches(batches) -> "Iterator[pa.RecordBatch]":
    import pyarrow.parquet as pq

    buf: list[dict] = []
    for rb in batches:
        for fpath, rg in zip(rb.column("path").to_pylist(),
                             rb.column("rg").to_pylist()):
            tbl = pq.ParquetFile(fpath).read_row_group(
                int(rg), columns=["url", "text"])
            urls = tbl.column("url").to_pylist()
            texts = tbl.column("text").to_pylist()
            for url, txt in zip(urls, texts):
                for recs in _doc_record_batches(
                        txt if isinstance(txt, str) else ""):
                    for r in recs:
                        r["url"] = url
                    buf.extend(recs)
                    while len(buf) >= _OUT_CHUNK:
                        yield _arrow_batch_from_records(buf[:_OUT_CHUNK])
                        buf = buf[_OUT_CHUNK:]
    if buf:
        yield _arrow_batch_from_records(buf)


def parse_pages_parquet(spark, path: str) -> DataFrame:
    """Scale path: one task per parquet row group; each PYTHON worker
    reads its split directly with pyarrow, so the raw text bytes never
    transit the JVM->Python Arrow channel (measured 2.5x faster than
    feeding a DataFrame through mapInPandas at 32 cores — the single
    JVM's Arrow feed is the bottleneck otherwise).  On a real cluster
    the same pattern applies per executor; split planning stays on the
    driver and the records output is a normal DataFrame."""
    splits = parquet_splits(path)
    if not splits:
        raise ValueError(f"no parquet files under {path}")
    return parse_splits(spark, splits)
