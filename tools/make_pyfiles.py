#!/usr/bin/env python
"""Builds log_parser_spark.zip for `spark-submit --py-files` (north rule:
the pipeline ships as a --py-files package)."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "log_parser_spark.zip"):
    out_path = os.path.join(REPO, out)
    pkg = os.path.join(REPO, "log_parser_spark")
    data = os.path.join(pkg, "data")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                full = os.path.join(root, f)
                # code + the vendored data tree (fixture/baseline logs,
                # staged oracle parquet — extracted at runtime by
                # log_parser_spark.datafiles when imported from the zip)
                if f.endswith(".py") or full.startswith(data + os.sep):
                    z.write(full, os.path.relpath(full, REPO))
    print(out_path)
    return out_path


if __name__ == "__main__":
    main()
