"""Drop-in CLI parity: `python -m log_parser_spark <log>` produces the
reference tool's run_dddd layout with byte-identical CSV files and the
byte-identical SHORT console summary.
"""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture(scope="module")
def cli_run(spark, tmp_path_factory):
    from log_parser_spark.__main__ import main
    out_parent = str(tmp_path_factory.mktemp("cli") / "output_files")
    log_path = "/root/reference/test/input_files/LOG_sample"
    run_dir = main([log_path, "-j", "-l", "-o", out_parent,
                    "--cores", "4"])
    return log_path, out_parent, run_dir


def test_cli_csv_bytes_match_reference(cli_run, reference):
    log_path, _parent, run_dir = cli_run
    with open(log_path) as f:
        lines = f.read().splitlines()
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        pl = reference["log_file"].ParsedLog(log_path, lines, False)
        co = reference["csv_outputter"]
        expected = {
            "counters.csv": co.get_counters_csv(pl.get_counters_mngr()),
            "histograms_human_readable.csv":
                co.get_human_readable_histogram_csv(pl.get_counters_mngr()),
            "histograms_tools.csv":
                co.get_tools_histogram_csv(pl.get_counters_mngr()),
            "compactions_stats.csv": co.get_compaction_stats_csv(
                pl.get_stats_mngr().get_compactions_stats_mngr()),
            "flushes.csv": co.get_flushes_csv(
                pl.get_cfs_names(include_auto_generated=False),
                pl.get_events_mngr()),
        }
    finally:
        os.chdir(cwd)
    for fname, want in expected.items():
        # newline="" preserves the \r\n terminators csv.writer emits
        with open(os.path.join(run_dir, fname), newline="") as f:
            assert f.read() == want, fname


def test_cli_json_and_log_written(cli_run):
    _log, _parent, run_dir = cli_run
    with open(os.path.join(run_dir, "log.json")) as f:
        j = json.load(f)
    assert "CSV-s" in j and j["CSV-s"]["Counters"].endswith("counters.csv")
    # files.csv skipped on this log (reference asserts there); the
    # run log records the skip
    with open(os.path.join(run_dir, "log_parser.log")) as f:
        assert "Files CSV skipped" in f.read()
    assert not os.path.exists(os.path.join(run_dir, "files.csv"))


def test_cli_run_numbering_increments(cli_run):
    """S12: a second run under the same parent gets run_0002."""
    from log_parser_spark.__main__ import main
    log_path, parent, run_dir = cli_run
    assert run_dir.endswith("run_0001")
    run2 = main([log_path, "-j", "-o", parent, "--cores", "4"])
    assert run2.endswith("run_0002")


def test_cli_console_short_matches_renderer(cli_run, capsys, spark):
    from log_parser_spark.__main__ import main
    from log_parser_spark.engine.json_render import render_console_short
    from log_parser_spark.parsing import parse_document
    log_path, parent, _ = cli_run
    main([log_path, "-o", parent, "--cores", "4"])
    out = capsys.readouterr().out
    with open(log_path) as f:
        direct = render_console_short(
            os.path.abspath(log_path), parse_document(f.read()))
    assert direct in out
    assert f"Log file: file://{os.path.abspath(log_path)}" in out
    # reference prints the baseline right after "Log file:"
    # (log_parser.py:309-314); LOG_sample is SpeeDB 6.22.1, whose
    # nearest-version baseline (bisect, J10 differential-pinned) is the
    # newest vendored speedb baseline
    from pathlib import Path

    from log_parser_spark.engine.options_diff import closest_baseline
    hit = closest_baseline("SPEEDB", "6.22.1")
    assert hit is not None
    assert f"Baseline Log: {Path(hit[2]).as_uri()}" in out
    assert "No Available Baseline Log" not in out


def test_cli_directory_mode(spark, tmp_path):
    """A directory of logs fans out: one sub-folder per document."""
    import shutil

    from log_parser_spark.__main__ import main
    logs = tmp_path / "logs"
    logs.mkdir()
    shutil.copy("/root/reference/test/input_files/LOG_sample",
                str(logs / "LOG_a"))
    shutil.copy("/root/reference/test/input_files/Rolled_LOG_sample.txt",
                str(logs / "LOG_b"))
    parent = str(tmp_path / "out")
    run_dir = main([str(logs), "-j", "-o", parent, "--cores", "4"])
    subs = sorted(os.listdir(run_dir))
    assert subs == ["LOG_a", "LOG_b"]
    for s in subs:
        assert os.path.exists(os.path.join(run_dir, s, "log.json"))
        assert os.path.exists(os.path.join(run_dir, s, "counters.csv"))


def test_cli_pages_parquet_mode(spark, tmp_path, monkeypatch):
    """A pages parquet dir fans out per url; relative -o works (the
    as_uri of a relative json path crashed once)."""
    from log_parser_spark.__main__ import main
    from log_parser_spark.corpus import write_pages_parquet
    pages = str(tmp_path / "pages")
    write_pages_parquet(spark, pages, 6)
    monkeypatch.chdir(tmp_path)
    run_dir = main([pages, "-j", "-o", "out", "--cores", "4"])
    subs = [d for d in os.listdir(run_dir)
            if os.path.isdir(os.path.join(run_dir, d))]
    assert len(subs) == 6
    assert any(os.path.exists(os.path.join(run_dir, s, "log.json"))
               for s in subs)
