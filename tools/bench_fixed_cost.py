#!/usr/bin/env python
"""Direct measurement of the pipeline's per-job fixed cost f.

BENCH/BASELINE.md explains sub-0.8 scaling readings at the old
96k-page input with a two-parameter model T(c) = W/c + f (W = linear
compute in core-seconds, f = per-run fixed cost: planning, sink
commits, job scheduling — invariant across core counts).  This probe
measures f DIRECTLY instead of inferring it from the model fit: it
runs the identical pipeline (same plans, same sink set, same warmup
protocol as tools/bench_scaling.py legs) over a corpus small enough
that W/c is a correction term, at both leg widths.

    f_c  ~=  wall(c, tiny)  -  W_tiny / c

W_tiny is estimated from the big-corpus throughput at the same width
in the same machine-state window (W_tiny = docs_tiny / docs_per_sec_big
* c), so the subtraction uses a same-window compute rate, not a
cross-session constant.  Output: one JSON line per width with
wall, estimated f, and the implied efficiency cap
(W96/6 + f) / (W96/6 + 4f) for the 96k and 240k protocols; appended
to BENCH/fixed_cost_probe.jsonl.

Usage: python tools/bench_fixed_cost.py   (~4 short pinned runs)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = int(os.environ.get("FC_TINY_PAGES", "2000"))
BIG = int(os.environ.get("FC_BIG_PAGES", "24000"))
WIDTHS = [6, 24]


def run(cpus: int, pages: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_PAGES=str(pages),
               BENCH_ONLY_PIPELINE="1",
               BENCH_SINGLE_LEG="1",
               BENCH_OUT=f"/tmp/bench_fc_{cpus}_{pages}")
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1800)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = []
    for c in WIDTHS:
        big = run(c, BIG)
        tiny = run(c, TINY)
        # same-window compute rate from the big leg, minus ITS OWN
        # fixed share: solve the 2x2 system
        #   wall_big  = W_big/c + f        W_big  = r * BIG
        #   wall_tiny = W_tiny/c + f       W_tiny = r * TINY
        # => r = c * (wall_big - wall_tiny) / (BIG - TINY)
        wall_big = big["queries"]["log_pipeline"]
        wall_tiny = tiny["queries"]["log_pipeline"]
        r = c * (wall_big - wall_tiny) / (BIG - TINY)  # core-s per page
        f = wall_tiny - r * TINY / c
        row = {"cores": c, "pages_big": BIG, "pages_tiny": TINY,
               "wall_big": wall_big, "wall_tiny": wall_tiny,
               "core_s_per_page": round(r, 5),
               "fixed_cost_sec": round(f, 2),
               "calib": [tiny.get("calib_sec_start"),
                         tiny.get("calib_sec_end")],
               "calib_mc": [tiny.get("calib_mc_sec_start"),
                            tiny.get("calib_mc_sec_end")]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # implied efficiency caps for perfectly linear compute, using the
    # 6-core leg's r and each width's own measured f
    r6 = rows[0]["core_s_per_page"]
    f6, f24 = rows[0]["fixed_cost_sec"], rows[1]["fixed_cost_sec"]
    caps = {}
    for pages in (96000, 240000):
        w = r6 * pages
        caps[str(pages)] = round((w / 6 + f6) / (w / 6 + 4 * f24), 3)
    # NOTE: caps use THIS window's measured rate r — under hypervisor
    # throttle r is inflated, which inflates W and thus the cap; read
    # the calib fields of the rows above before comparing these caps
    # against pairing efficiencies from other windows.
    summary = {"summary": True, "fixed_cost_sec": {"6": f6, "24": f24},
               "core_s_per_page": r6,
               "efficiency_cap_linear_compute_this_window": caps,
               "width_rate_ratio_24_over_6": round(
                   rows[1]["core_s_per_page"] / max(r6, 1e-9), 3)}
    print(json.dumps(summary), flush=True)
    with open(os.path.join(REPO, "BENCH", "fixed_cost_probe.jsonl"),
              "a") as fh:
        for row in rows + [summary]:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
