"""Stage driver-verifiable oracle artifacts into log_parser_spark/data/:

  log_records.parquet     — the parsed records of the 48-page corpus
                            (attrs serialized as canonical JSON so DuckDB
                            and Spark read the same thing)
  baseline_options.parquet — options of every vendored baseline log

Both are committed; tests/test_staged_artifacts.py re-parses live and
asserts equality, so the parser remains the source of truth and the
driver's DuckDB oracle can verify the relational layer over a stable
input.

Usage: python tools/stage_records.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_parser_spark.queries import _N_LOG_PAGES  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "log_parser_spark", "data")


def records_arrow(spark) -> pa.Table:
    """Parsed records with attrs serialized to JSON, as an Arrow table
    (toArrow preserves nullable-int64 types that toPandas would float)."""
    from pyspark.sql import functions as F

    from log_parser_spark.corpus import build_pages_df
    from log_parser_spark.engine.parse import parse_pages
    from log_parser_spark.engine.session import ensure_workers_can_import
    ensure_workers_can_import(spark)
    rec = (parse_pages(build_pages_df(spark, _N_LOG_PAGES))
           .withColumn("attrs_json", F.to_json("attrs")).drop("attrs")
           .orderBy("url", "seq"))
    return rec.toArrow()


def main():
    from log_parser_spark.engine.options_diff import baseline_options_rows
    from log_parser_spark.engine.session import get_spark

    spark = get_spark(app_name="stage_records", cores=8,
                      shuffle_partitions=8)

    rec = records_arrow(spark)
    out = os.path.join(DATA_DIR, "log_records.parquet")
    pq.write_table(rec, out, compression="zstd")
    print(f"wrote {out}: {rec.num_rows} rows, "
          f"{os.path.getsize(out) / 1024:.0f} KiB")
    print(rec.schema)

    rows = baseline_options_rows()
    tbl = pa.table({
        "product": [r[0] for r in rows],
        "bversion": [r[1] for r in rows],
        "section": [r[2] for r in rows],
        "cf": [r[3] for r in rows],
        "option": [r[4] for r in rows],
        "bvalue": [r[5] for r in rows],
    })
    bout = os.path.join(DATA_DIR, "baseline_options.parquet")
    pq.write_table(tbl, bout, compression="zstd")
    print(f"wrote {bout}: {len(rows)} rows, "
          f"{os.path.getsize(bout) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
