"""Stage golden-parquet oracles for the non-SQL-expressible queries
(hash/LSH/ANN ops + the nested JSON report) into
log_parser_spark/data/golden/.

Each golden is the query's own output at sf0.01 — the scale the driver
runs the correctness gate at — written as a single sorted parquet file
that the DuckDB oracle reads back verbatim.  The corpus is seeded and
every query in the list is deterministic (xxhash64/md5, seeded
sampling); this script verifies that by running each query TWICE and
refusing to stage on any mismatch.  tests/test_golden_artifacts.py pins
golden == live so parser/op changes force a restage.

Staging at a NON-default sf dir writes to data/golden_<tag>/ instead
(e.g. sf0.1 -> golden_sf0.1), so sf-dependent bugs in the golden-backed
queries can't hide behind the sf0.01 pin: `tools/selfcheck.py
/root/testdata/sf0.1` redirects the golden oracle reads to that set.

Usage: python tools/stage_golden.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "log_parser_spark", "data")
SF_DIR = "/root/testdata/sf0.01"


def golden_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    sub = "golden" if sf_dir.rstrip("/") == SF_DIR else f"golden_{tag}"
    return os.path.join(DATA_DIR, sub)


def sorted_arrow(df):
    tbl = df.toArrow()
    return tbl.sort_by([(c, "ascending") for c in tbl.column_names])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    from log_parser_spark.engine.session import (ensure_workers_can_import,
                                                 get_spark)
    from log_parser_spark.queries import QUERIES
    from log_parser_spark.queries_ext import GOLDEN_QUERIES

    spark = get_spark(app_name="stage_golden", cores=8,
                      shuffle_partitions=8)
    ensure_workers_can_import(spark)
    golden_dir = golden_dir_for(sf_dir)
    os.makedirs(golden_dir, exist_ok=True)

    for name in GOLDEN_QUERIES:
        t1 = sorted_arrow(QUERIES[name](spark, sf_dir))
        t2 = sorted_arrow(QUERIES[name](spark, sf_dir))
        if not t1.equals(t2):
            raise SystemExit(
                f"{name}: two runs differ — NOT deterministic, refusing "
                f"to stage a golden for it")
        out = os.path.join(golden_dir, f"{name}.parquet")
        pq.write_table(t1, out, compression="zstd")
        print(f"wrote {out}: {t1.num_rows} rows, "
              f"{os.path.getsize(out) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
