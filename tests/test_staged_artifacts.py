"""The committed oracle artifacts in log_parser_spark/data/ must equal
what the live parser produces — the parser stays the source of truth;
the staged parquet only makes the relational layer driver-verifiable.

Regenerate with `python tools/stage_records.py` after any parser change.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_parser_spark.queries import BASELINE_OPTS_PATH, RECORDS_PATH


def _canon_attrs(s):
    return json.dumps(json.loads(s), sort_keys=True) if s else None


def test_staged_records_match_live_parse(spark):
    from tools.stage_records import records_arrow

    live = records_arrow(spark)
    staged = pq.read_table(RECORDS_PATH)

    assert staged.num_rows == live.num_rows
    assert staged.schema.equals(live.schema), (
        f"schema drift:\n{staged.schema}\nvs\n{live.schema}")

    lp = live.to_pylist()
    sp = staged.to_pylist()
    for i, (a, b) in enumerate(zip(lp, sp)):
        a["attrs_json"] = _canon_attrs(a["attrs_json"])
        b["attrs_json"] = _canon_attrs(b["attrs_json"])
        assert a == b, f"row {i} differs: {a} vs {b}"


def test_staged_baseline_options_match_live():
    from log_parser_spark.engine.options_diff import baseline_options_rows

    live = baseline_options_rows()
    staged = pq.read_table(BASELINE_OPTS_PATH).to_pylist()
    staged_rows = [(r["product"], r["bversion"], r["section"], r["cf"],
                    r["option"], r["bvalue"]) for r in staged]
    assert staged_rows == live
