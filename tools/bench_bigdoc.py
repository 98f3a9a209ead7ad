"""Oversized-document smoke: build a VALID multi-hundred-MB log (one
header + options prologue, thousands of distinct-timestamp stats-dump
bodies) and stream-parse it, reporting throughput and peak RSS.

The old parser quarantined >256 MB documents; the streaming path (lazy
entry segmentation + incremental record flushes) must parse them with
peak memory ~1-2x the text.

Usage: python tools/bench_bigdoc.py [target_mb]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_parser_spark.corpus import load_corpus_logs  # noqa: E402
from log_parser_spark.parsing.document import DocumentParser  # noqa: E402


def build_big_doc(target_mb: int) -> str:
    logs = load_corpus_logs()
    sample = logs["sample"]
    # prologue: header + options, up to the first stats dump
    cut = sample.index("------- DUMPING STATS")
    cut = sample.rindex("\n", 0, cut) + 1
    prologue = sample[:cut]

    # body: one full stats dump (counters + histograms + comp stats),
    # without its synthetic metadata header
    stats = logs["sample_stats"]
    body = "\n".join(stats.splitlines()[3:]) + "\n"

    chunks = [prologue]
    size = len(prologue)
    i = 0
    while size < target_mb * 2**20:
        # distinct timestamps per copy keep every dump a separate entry
        stamped = body.replace(
            "2022/11/24-15:58:", f"2023/03/{(i % 27) + 1:02d}-15:58:")
        chunks.append(stamped)
        size += len(stamped)
        i += 1
    return "".join(chunks)


def main():
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    text = build_big_doc(target_mb)
    print(f"document: {len(text) / 2**20:.0f} MB "
          f"(old cap was 256 MB)")

    t0 = time.time()
    n = quarantined = 0
    kinds = {}
    for batch in DocumentParser(text).run_stream():
        n += len(batch)
        for r in batch:
            kinds[r["kind"]] = kinds.get(r["kind"], 0) + 1
            if r["kind"] == "quarantine":
                quarantined += 1
                print("QUARANTINE:", r["attrs"])
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

    print(f"records: {n} ({quarantined} quarantine), "
          f"wall {dt:.1f}s, {len(text) / 2**20 / dt:.1f} MB/s, "
          f"peak RSS {rss:.2f} GB "
          f"({rss * 2**30 / len(text):.1f}x the text)")
    top = sorted(kinds.items(), key=lambda kv: -kv[1])[:6]
    print("top kinds:", top)
    assert quarantined == 0, "oversized valid doc must parse cleanly"


if __name__ == "__main__":
    main()
