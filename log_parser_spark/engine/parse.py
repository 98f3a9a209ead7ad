"""The parse stage: pages DataFrame -> records DataFrame.

``mapInPandas`` is the one Python hop in the pipeline (input_hint:
vectorized pandas/Arrow UDFs, no per-row Python UDFs).  State is
strictly per document, so the stage is embarrassingly parallel across
urls; the explicit ``select("url", "text")`` before the map guarantees
column pruning reaches the scan (the html binary column is never read).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_parser_spark.engine.schema import RECORD_FIELDS, RECORDS_SCHEMA
from log_parser_spark.parsing.document import parse_document

# Bound the size of each output Arrow batch (records per yielded frame).
_OUT_CHUNK = 20_000


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    buf: list[dict] = []

    def flush(buf):
        return pd.DataFrame(
            {f: [r.get(f) for r in buf] for f in RECORD_FIELDS})

    for pdf in batches:
        for url, text in zip(pdf["url"].values, pdf["text"].values):
            recs = parse_document(text if isinstance(text, str) else "")
            for r in recs:
                r["url"] = url
            buf.extend(recs)
            while len(buf) >= _OUT_CHUNK:
                yield flush(buf[:_OUT_CHUNK])
                buf = buf[_OUT_CHUNK:]
    if buf:
        yield flush(buf)


def parse_pages(pages: DataFrame, repartition: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> records DataFrame."""
    cols = pages.select("url", "text")
    if repartition:
        # spread documents evenly; hot domains are broken up because the
        # hash key is the full url, not the domain
        cols = cols.repartition(repartition, F.xxhash64("url"))
    return cols.mapInPandas(_parse_batches, schema=RECORDS_SCHEMA)
