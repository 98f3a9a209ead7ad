"""S9 structural parity: our parsed-json report == the reference's
json_outputter.get_json over its ENTIRE shipped corpus (samples +
baseline logs), including nested key ORDER.

Normalizations: the 'Baseline Log' value is an environment path
(reference emits /root/reference/..., we emit the vendored copy) and is
compared by basename only.
"""

import glob as _glob
import json
import os as _os

import pytest

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.engine.json_render import render_parsed_json
from log_parser_spark.parsing import parse_document

# sample_stats is excluded: the reference's own get_json raises an
# AssertionError on it (same family as its files-CSV assert).
# synthetic_stats is our generated stats-rich log (corpus.py) exercising
# the seek/bloom/growth/block-cache surfaces the shipped fixtures leave
# empty — the reference parses it too, so it's a full parity member.
CORPUS_IDS = ["sample", "rolled", "bad", "synthetic_stats"] + sorted(
    _os.path.basename(p) for p in
    _glob.glob("/root/reference/baseline_logs/LOG-*"))


def _normalize(o):
    if isinstance(o, dict):
        return {k: (_os.path.basename(v) if k == "Baseline Log"
                    else _normalize(v)) for k, v in o.items()}
    if isinstance(o, list):
        return [_normalize(v) for v in o]
    return o


def _assert_same(ref, ours, path=""):
    if isinstance(ref, dict):
        assert isinstance(ours, dict), f"{path}: {type(ours)} != dict"
        assert list(ref.keys()) == list(ours.keys()), \
            f"{path}: keys/order {list(ref)} != {list(ours)}"
        for k in ref:
            _assert_same(ref[k], ours[k], f"{path}.{k}")
    else:
        assert ref == ours, f"{path}: {ref!r} != {ours!r}"


@pytest.fixture(scope="module")
def ref_jsons(reference):
    import json_outputter  # noqa: F401 (loaded via reference fixture path)
    logs = load_corpus_logs()
    cwd = _os.getcwd()
    _os.chdir("/root/reference")
    try:
        out = {}
        for cid in CORPUS_IDS:
            pl = reference["log_file"].ParsedLog(
                cid, logs[cid].splitlines(), True)
            out[cid] = json.loads(json.dumps(json_outputter.get_json(pl)))
        return out
    finally:
        _os.chdir(cwd)


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_parsed_json_matches_reference(cid, ref_jsons):
    logs = load_corpus_logs()
    ours = render_parsed_json(cid, parse_document(logs[cid]))
    ref_n, ours_n = _normalize(ref_jsons[cid]), _normalize(ours)
    _assert_same(ref_n, ours_n, cid)
    # structural + order equality implies serialized-byte equality for
    # the shipped JSON file / LONG console dump — assert it directly
    assert json.dumps(ours_n, indent=1) == json.dumps(ref_n, indent=1)


def test_parsed_json_report_sink(spark):
    """The distributed applyInPandas sink produces the same report the
    renderer produces directly."""
    from pyspark.sql import functions as F  # noqa: F401

    from log_parser_spark.engine.parse import parse_pages
    from log_parser_spark.engine.schema import PAGES_SCHEMA
    from log_parser_spark.engine.summary import parsed_json_report

    logs = load_corpus_logs()
    rows = [(f"https://t/{cid}", None, None, logs[cid], "en")
            for cid in ["sample", "rolled"]]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    records = parse_pages(pages)
    out = {r["url"]: json.loads(r["summary_json"])
           for r in parsed_json_report(records).collect()}
    assert set(out) == {"https://t/sample", "https://t/rolled"}
    for cid in ["sample", "rolled"]:
        direct = render_parsed_json(
            f"https://t/{cid}", parse_document(logs[cid]))
        _assert_same(_normalize(json.loads(json.dumps(direct))),
                     _normalize(out[f"https://t/{cid}"]))
