"""One-shot sf1 stress leg (round-5 VERDICT item 7): the capped dedup
ops have a measured 10x scale probe, but the full pipeline + query
suite was only ever timed at sf0.1 — and both round-5 plan pathologies
were invisible at the smaller scale.  This tool runs the COMPLETE
bench.py suite back-to-back at sf0.1 (reference) and at a synthetic
sf1 (10x tables, 240k pages), same session of machine state, and gates
every query's sf1/sf0.1 wall-time ratio at <= 13 (10x data x 1.3
slack; fixed per-job overhead makes real ratios land well under).

sf1 synthesis (deterministic, derived from the sf0.1 tables — no
external data): 10 key-shifted copies of every fact table with
referential integrity preserved (orders.o_custkey shifts with
customer.c_custkey, lineitem's three FKs shift with their parents),
dimension tables (nation/region) kept single-copy, documents passed
through per-copy letter-substitution ciphers and embeddings through
per-copy deterministic sign flips — the same linear-output scrambles
as tools/bench_dedup_scaling.py, so true dedup/ANN output grows ~10x,
not quadratically.

Writes BENCH/sf1_leg.json with both runs' full timings, the
calibration sentinels, per-query ratios, and the gate result.

Usage: python tools/bench_sf1.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = "/tmp/sf1_tables"
SRC_DIR = "/root/testdata/sf0.1"
N_COPIES = 10
OFF = 10_000_000
_CIPHER_SRC = "etaoinshrd"

# per-table key columns to shift by copy_index * OFF (referential
# integrity: a FK shifts iff its parent PK shifts)
_SHIFT = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
_DIMS = ["nation", "region"]


def build_sf1(spark, dst: str = SF1_DIR, src: str = SRC_DIR) -> str:
    from pyspark.sql import functions as F
    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for t in _DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{dst}/{t}.parquet")
    for t, keys in _SHIFT.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        legs = []
        for i in range(N_COPIES):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(i * OFF))
            if t == "documents":
                dst_alpha = _CIPHER_SRC[i:] + _CIPHER_SRC[:i]
                c = c.withColumn(
                    "text", F.translate("text", _CIPHER_SRC, dst_alpha))
            if t == "embeddings":
                def make_flip(ci):
                    def flip(v, j):
                        sign = (F.lit(1.0) - F.lit(2.0)
                                * (F.cos(F.lit(float(ci * 31 + 1))
                                         * (j + 1).cast("double")
                                         * F.lit(7.0)) < 0).cast("double"))
                        return (v.cast("double") * sign).cast("float")
                    return flip
                c = c.withColumn(
                    "embedding", F.transform("embedding", make_flip(i)))
            legs.append(c)
        out = legs[0]
        for c in legs[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    with open(marker, "w") as f:
        f.write(f"copies={N_COPIES} src={src}")
    return dst


def run_bench(env_extra: dict) -> dict:
    env = dict(os.environ, BENCH_SINGLE_LEG="1", **env_extra)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=5400)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stderr[-2000:]
    return json.loads(lines[-1])


def main():
    if "--rebuild" in sys.argv:
        import shutil
        shutil.rmtree(SF1_DIR, ignore_errors=True)

    from log_parser_spark.engine.session import get_spark
    spark = get_spark(app_name="sf1_build", cores=32,
                      shuffle_partitions=32)
    build_sf1(spark)
    spark.stop()

    ref = run_bench({"SPARK_GRAFT_SF_DIR": SRC_DIR,
                     "BENCH_PAGES": "24000",
                     "BENCH_OUT": "/tmp/bench_out_sf01ref"})
    big = run_bench({"SPARK_GRAFT_SF_DIR": SF1_DIR,
                     "BENCH_PAGES": "240000",
                     "BENCH_OUT": "/tmp/bench_out_sf1"})

    ratios, worst = {}, ("", 0.0)
    for name, t1 in big["queries"].items():
        if name.endswith("_legs"):
            continue
        t0 = ref["queries"].get(name)
        if not t0 or not isinstance(t1, (int, float)):
            continue
        r = round(t1 / t0, 2)
        ratios[name] = r
        if r > worst[1]:
            worst = (name, r)

    gate = 13.0  # 10x data x 1.3 slack
    result = {
        "sf01": ref, "sf1": big, "ratios": ratios,
        "worst": {"query": worst[0], "ratio": worst[1]},
        "gate": f"per-query sf1/sf0.1 wall ratio <= {gate} "
                f"(10x data x 1.3 slack)",
        "pass": all(r <= gate for r in ratios.values()),
    }
    print(json.dumps({"ratios": ratios, "worst": result["worst"],
                      "pass": result["pass"],
                      "calib_sf1": [big["calib_sec_start"],
                                    big["calib_sec_end"],
                                    big["calib_mc_sec_start"],
                                    big["calib_mc_sec_end"]]}))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "sf1_leg.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
