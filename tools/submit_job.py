#!/usr/bin/env python
"""spark-submit entry point (north rule: ships via --py-files).

Usage:
  python tools/make_pyfiles.py
  spark-submit --master local[8] --py-files log_parser_spark.zip \\
      tools/submit_job.py <pages_parquet_dir> <out_dir> [n_buckets]

Runs the full parse->route->aggregate pipeline and prints the metrics
JSON on the last line.
"""

import json
import sys

from pyspark.sql import SparkSession


def main():
    pages_path, out_dir = sys.argv[1], sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # the package arrives via --py-files (sc.addPyFile distribution)
    from log_parser_spark.engine.pipeline import run_pipeline

    metrics = run_pipeline(spark, out_dir, pages_path=pages_path,
                           n_buckets=n_buckets)
    print(json.dumps(metrics["rows_out"]))


if __name__ == "__main__":
    main()
