"""Oversized-document parse path: the lazy-segmentation + streaming
parser must produce records IDENTICAL to the eager path, and actually
handle documents beyond the old 256 MB quarantine cap."""

import pytest

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.parsing.document import DocumentParser, parse_document
from log_parser_spark.parsing.entries import segment_lines, segment_text_lazy


def _stream_all(text, flush_every=97):
    p = DocumentParser(text)
    out = []
    for batch in p.run_stream(flush_every=flush_every):
        out.extend(batch)
    return out


@pytest.mark.parametrize("cid", ["sample", "sample_stats", "rolled", "bad",
                                 "synthetic_stats"])
def test_stream_equals_eager(cid):
    text = load_corpus_logs()[cid]
    assert _stream_all(text) == parse_document(text)


@pytest.mark.parametrize("cid", ["sample", "rolled", "synthetic_stats"])
def test_lazy_segmentation_equals_eager(cid):
    text = load_corpus_logs()[cid]
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    eager, ej = segment_lines(lines)
    lazy, lj = segment_text_lazy(text)
    assert ej == lj
    assert len(eager) == len(lazy)
    for i in range(len(eager)):
        a, b = eager[i], lazy[i]
        assert (a.start_line_idx, a.time, a.warn_type, a.code_pos,
                a.msg_lines, a.cf_name, a.job_id) == \
               (b.start_line_idx, b.time, b.warn_type, b.code_pos,
                b.msg_lines, b.cf_name, b.job_id), f"entry {i}"


def test_lazy_path_forced_equals_eager(monkeypatch):
    """Force the lazy/streaming branch on a normal-sized doc (as the
    oversized path would take it) and require identical records."""
    text = load_corpus_logs()["synthetic_stats"]
    expected = parse_document(text)
    monkeypatch.setattr(DocumentParser, "LAZY_DOC_BYTES", 10)
    assert _stream_all(text) == expected
    assert parse_document(text) == expected  # run() takes lazy branch too


def test_oversized_document_parses_instead_of_quarantine(monkeypatch):
    """A document over the OLD 256 MB cap must now parse (scaled-down
    here by lowering the lazy threshold; the memory bound is by
    construction: text + offsets + bounded record batches)."""
    base = load_corpus_logs()["sample"]
    expected_batch = parse_document(base)
    n_per_doc = len(expected_batch)
    monkeypatch.setattr(DocumentParser, "LAZY_DOC_BYTES", 1000)
    out = _stream_all(base)
    assert len(out) == n_per_doc
    assert not any(r["kind"] == "quarantine" and
                   "oversized" in (r["attrs"] or {}).get("reason", "")
                   for r in out)
    # the hard cap still quarantines what can't be a table cell
    monkeypatch.setattr(DocumentParser, "MAX_DOC_BYTES", 100)
    q = parse_document(base)
    assert len(q) == 1 and q[0]["attrs"]["reason"] == "oversized_document"
