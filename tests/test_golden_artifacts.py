"""The committed golden-parquet oracles in log_parser_spark/data/golden/
must equal what the live queries produce at sf0.01 — the ops stay the
source of truth; the goldens only make the hash/LSH/ANN queries and the
nested JSON report driver-verifiable.

Regenerate with `python tools/stage_golden.py` after any change to the
ops, the parser, or the renderer.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_parser_spark.datafiles import data_path
from log_parser_spark.queries_ext import GOLDEN_QUERIES

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_matches_live(spark, name):
    from tools.stage_golden import sorted_arrow

    from log_parser_spark.engine.session import ensure_workers_can_import
    from log_parser_spark.queries import QUERIES
    ensure_workers_can_import(spark)

    live = sorted_arrow(QUERIES[name](spark, SF_DIR))
    staged = pq.read_table(data_path("golden", f"{name}.parquet"))
    assert staged.schema.equals(live.schema), (
        f"{name} schema drift:\n{staged.schema}\nvs\n{live.schema}")
    assert staged.num_rows == live.num_rows
    assert staged.equals(live), (
        f"{name}: golden != live — regenerate with tools/stage_golden.py")
