"""S10: the SHORT console printout byte-identical to the reference's
console_outputter over the full corpus."""

import glob as _glob
import os as _os

import pytest

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.engine.json_render import render_console_short
from log_parser_spark.parsing import parse_document

CORPUS_IDS = ["sample", "rolled", "bad", "synthetic_stats"] + sorted(
    _os.path.basename(p) for p in
    _glob.glob("/root/reference/baseline_logs/LOG-*"))


@pytest.fixture(scope="module")
def ref_console(reference):
    import sys
    sys.path.insert(0, "/root/reference")
    cwd = _os.getcwd()
    _os.chdir("/root/reference")
    try:
        import console_outputter
        import utils as ref_utils
        logs = load_corpus_logs()
        out = {}
        for cid in CORPUS_IDS:
            pl = reference["log_file"].ParsedLog(
                cid, logs[cid].splitlines(), True)
            out[cid] = console_outputter.get_console_output(
                cid, pl, ref_utils.ConsoleOutputType.SHORT)
        return out
    finally:
        _os.chdir(cwd)


@pytest.mark.parametrize("cid", CORPUS_IDS)
def test_console_short_bytes(cid, ref_console):
    logs = load_corpus_logs()
    assert render_console_short(cid, parse_document(logs[cid])) \
        == ref_console[cid]
