"""Pathological stats-dump interleavings (shapes from the reference's
own test_stats_mngr non-contiguous cases): the DUMPING STATS marker
separated from its dump body by unrelated entries, and a repeated
marker.  The routed comp-stats output must stay byte-identical to the
reference's CSV."""

import os

import pytest

from log_parser_spark.engine import branches, csv_render, sinks
from log_parser_spark.parsing import parse_document

_HEADER = ("2023/07/18-19:27:00.000000 1 RocksDB version: 7.7.3\n"
           "2023/07/18-19:27:00.000001 1 Git sha abc\n"
           "2023/07/18-19:27:00.000002 1 DB Session ID:  "
           "P0000000000000000001\n")

_DUMP_BODY = """** DB Stats **
Uptime(secs): 0.7 total, 0.7 interval
Cumulative writes: 0 writes, 0 keys, 0 commit groups, 0.0 writes per commit group, ingest: 0.00 GB, 0.00 MB/s
Cumulative WAL: 0 writes, 0 syncs, 0.00 writes per sync, written: 0.00 GB, 0.00 MB/s
Cumulative stall: 00:00:0.000 H:M:S, 0.0 percent
Interval writes: 0 writes, 0 keys, 0 commit groups, 0.0 writes per commit group, ingest: 0.00 MB, 0.00 MB/s
Interval WAL: 0 writes, 0 syncs, 0.00 writes per sync, written: 0.00 GB, 0.00 MB/s
Interval stall: 00:00:0.000 H:M:S, 0.0 percent
Write Stall (count): write-buffer-manager-limit-stops: 0,
 ** Compaction Stats [default] **
Level    Files   Size     Score Read(GB)  Rn(GB) Rnp1(GB) Write(GB) Wnew(GB) Moved(GB) W-Amp Rd(MB/s) Wr(MB/s) Comp(sec) CompMergeCPU(sec) Comp(cnt) Avg(sec) KeyIn KeyDrop Rblob(GB) Wblob(GB)
------------------------------------------------------------------------------------------------------------------------------------------------------------------------------------------------
  L0      2/0   322.40 MB   1.3      0.0     0.0      0.0       0.1      0.1       0.0   1.0      0.0    594.4      0.12              0.00         1    0.120       0      0       0.0       0.0
 Sum    720/40  41.77 GB   0.0      0.0     0.0      0.0       0.1      0.1       0.2   1.0      0.0    594.4      0.12              0.00         1    0.120       0      0       0.0       0.0
 Int      0/0    0.00 KB   0.0      0.0     0.0      0.0       0.1      0.1       0.2   1.0      0.0    594.4      0.12              0.00         1    0.120       0      0       0.0       0.0"""  # noqa

INTERLEAVED_1 = _HEADER + (
    "2023/07/18-19:27:01.889729 27127 [/db_impl/db_impl.cc:1084] "
    "------- DUMPING STATS -------\n"
    "2023/07/18-19:27:01.889745 26641 [/column_family.cc:1044] [default] "
    "Increasing compaction threads because of estimated pending compaction "
    "bytes 18555651178\n"
    "2023/07/18-19:27:01.890259 27127 [/db_impl/db_impl.cc:1086] \n"
    + _DUMP_BODY + "\n")

INTERLEAVED_2 = _HEADER + (
    "2023/07/18-19:27:01.889729 27127 [/db_impl/db_impl.cc:1084] "
    "------- DUMPING STATS -------\n"
    "2023/07/18-19:27:01.889745 26641 [/column_family.cc:1044] [default] "
    "Increasing compaction threads because of estimated pending compaction "
    "bytes 18555651178\n"
    "2023/07/18-19:27:01.889806 26641 (Original Log Time "
    "2023/07/18-19:27:01.887253) [/db_impl/db_impl_compaction_flush.cc:3428]"
    " [default] Moving #13947 to level-4 67519682 bytes\n"
    "2023/07/18-19:27:01.889746 27127 [/db_impl/db_impl.cc:1084] "
    "------- DUMPING STATS -------\n"
    "2023/07/18-19:27:01.890259 27127 [/db_impl/db_impl.cc:1086] \n"
    + _DUMP_BODY + "\n")


@pytest.mark.parametrize("text", [INTERLEAVED_1, INTERLEAVED_2],
                         ids=["marker-gap", "double-marker"])
def test_interleaved_dump_comp_stats_csv_bytes(text, reference):
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        import csv_outputter
        pl = reference["log_file"].ParsedLog("p", text.splitlines(), False)
        ref_csv = csv_outputter.get_compaction_stats_csv(
            pl.get_stats_mngr().get_compactions_stats_mngr())
    finally:
        os.chdir(cwd)

    recs = parse_document(text)
    rows = [{"url": "u", "ts": r["ts"], "cf": r["cf"],
             "level_key": r["name"], "attrs": r["attrs"],
             "payload_json": r["payload_json"], "seq": r["seq"]}
            for r in recs if r["kind"] == "comp_stats"]
    assert csv_render.render_compaction_stats_csv(rows) == ref_csv
