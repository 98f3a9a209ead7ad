"""Property-based differentials: random inputs, the reference
implementation as the oracle.

Covers the semantics most likely to drift in reimplementation:
- option-value sanitization + diff coercion (db_options)
- human-readable number/byte formatting (utils)
- flow start/finish pairing on RANDOM multi-start/finish sequences
  (events manager) — beyond the fixed pathological fixtures.
"""

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

from log_parser_spark.engine.json_render import (View, flush_flow_pairs,
                                                 human_bytes, human_num,
                                                 sanitize_value,
                                                 values_differ)
from log_parser_spark.parsing import parse_document

sys.path.insert(0, "/root/reference")
_CWD = os.getcwd()


def _ref():
    os.chdir("/root/reference")
    import db_options
    import utils as ref_utils
    os.chdir(_CWD)
    return db_options, ref_utils


VALUE_POOL = st.one_of(
    st.sampled_from(["true", "True", "false", "0", "1", "42", "-3",
                     "none", "(nil)", "nil", "nullptr", "null", "0x0",
                     "0x7f00aaBB", "Pointer (0x7f00aaBB)", "Snappy",
                     "leveldb.BytewiseComparator", "", "0.5", "a.b.c",
                     "0x", "x0x12", "TRUE", "False "]),
    st.text(min_size=0, max_size=12))


@settings(max_examples=200, deadline=None)
@given(v=VALUE_POOL)
def test_sanitize_matches_reference(v):
    db_options, _ = _ref()
    assert sanitize_value(v)[0] == db_options.get_sanitized_value(v)


@settings(max_examples=200, deadline=None)
@given(a=VALUE_POOL, b=VALUE_POOL)
def test_values_differ_matches_reference(a, b):
    db_options, _ = _ref()
    assert values_differ(a, b) == \
        db_options.are_non_sanitized_values_different(a, b)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=0, max_value=10**14))
def test_human_formats_match_reference(n):
    _, ref_utils = _ref()
    assert human_bytes(n) == ref_utils.get_human_readable_num_bytes(n)
    assert human_num(n) == ref_utils.get_human_readable_number(n)


# --- flow pairing on random sequences ----------------------------------

_HEADER = ("2023/01/01-00:00:00.000000 1 RocksDB version: 7.7.3\n"
           "2023/01/01-00:00:00.000001 1 Git sha abc\n"
           "2023/01/01-00:00:00.000002 1 DB Session ID:  P0000000000000000001\n")

EVENTS_SEQ = st.lists(
    st.tuples(st.sampled_from([7, 8]),          # job id
              st.sampled_from(["start", "finish"])),
    min_size=1, max_size=10)


def _flow_log(seq):
    lines = [_HEADER.rstrip("\n")]
    micros = 1672531200000000
    for i, (job, kind) in enumerate(seq):
        ts = f"2023/01/01-00:00:{i + 1:02d}.000000 1"
        if kind == "start":
            lines.append(f"{ts} [/flush_job.cc:335] [default] [JOB {job}] "
                         f"Flushing memtable with next log file: 5")
            lines.append(
                f'{ts} EVENT_LOG_v1 {{"time_micros": {micros + i}, '
                f'"job": {job}, "event": "flush_started", '
                f'"num_memtables": 1, "num_entries": 10, "num_deletes": 0, '
                f'"total_data_size": 1000, "memory_usage": 1000, '
                f'"flush_reason": "Write Buffer Full"}}')
        else:
            lines.append(
                f'{ts} EVENT_LOG_v1 {{"time_micros": {micros + i}, '
                f'"job": {job}, "event": "flush_finished", '
                f'"output_compression": "NoCompression", '
                f'"lsm_state": [1, 0, 0, 0, 0, 0, 0], '
                f'"immutable_memtables": 0}}')
    return "\n".join(lines) + "\n"


@settings(max_examples=40, deadline=None)
@given(seq=EVENTS_SEQ)
def test_flow_pairing_matches_reference_on_random_sequences(seq):
    text = _flow_log(seq)

    os.chdir("/root/reference")
    try:
        import events as rev
        import log_file
        pl = log_file.ParsedLog("p", text.splitlines(), False)
        em = pl.get_events_mngr()
        expected = {}
        for cf in ["default", "DB_WIDE"]:
            for s, e in em.get_cf_flow_events(rev.FlowType.FLUSH, cf):
                expected[(cf, s.get_job_id(),
                          s.get_time_since_epoch_microseconds())] = (
                    None if e is None
                    else e.get_time_since_epoch_microseconds())
    finally:
        os.chdir(_CWD)

    view = View(parse_document(text))
    got = {}
    for cf in ["default", "DB_WIDE"]:
        for s, e in flush_flow_pairs(view, cf):
            got[(cf, s["job_id"], s["micros"])] = (
                None if e is None else e["micros"])
    assert got == expected
