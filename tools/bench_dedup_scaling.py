"""Empirical companion to the dedup bucket-cap argument: run the three
capped near-dup ops (minhash LSH, simhash banded Hamming, cosine LSH)
at a base corpus size and at ~10x that size, and fit the wall-time
scaling exponent.  The caps bound every within-bucket join at
max_bucket_size^2, so wall time must grow ~linearly in corpus size
(slope ~1, gate < 1.3) — without the caps a boilerplate flood makes the
bucket joins quadratic and the 10x leg explodes.

Corpus construction (all deterministic, derived from the sf tables):

- documents x10: ten copies, each passed through a DISTINCT letter
  substitution cipher (translate of the 10 most common letters, rotated
  per copy).  Within-copy shingle structure is preserved; cross-copy
  shingles are disjoint — so the TRUE pair set grows ~10x, not
  quadratically, and the measurement isolates engine scaling from
  output-size scaling.
- embeddings x10: ten copies under per-copy deterministic sign flips
  (an orthogonal transform: within-copy cosine geometry preserved,
  cross-copy directions scrambled).
- each leg plants a bucket flood (every 50th doc shares one base text
  + unique tail; 300 scalar multiples of one vector) so the
  drop-accounting side output MUST be non-empty — the probe also
  verifies the caps fire, not just that they're cheap.

Timings are best-of-2 with the bench.py CPU-calibration sentinel per
leg, appended to BENCH/dedup_scaling.jsonl.

The exponent is fitted on OVERHEAD-SUBTRACTED compute time: a third
"overhead" leg runs the identical op plans on a ~256-doc slice, where
compute is negligible, so its wall time measures the fixed Spark cost
(stage scheduling, codegen, shuffle setup) that would otherwise
dominate the base leg and flatten the fitted slope toward 0 — a
super-linear within-bucket blowup could hide inside that flattening.
Both the raw and the compute slopes are reported; the <1.3 gate is on
the compute slope (the honest one).

The base leg is 5 corpus copies and the big leg 50 (still a 10x span):
at 1 copy the r5 probe's base wall was ~1.4x the measured overhead, so
the fitted exponents (0.24-0.42) mostly measured fixed cost, not the
ops.  Per-op measurement order is overhead -> base -> x10 BACK TO
BACK, with the op's plan shape warmed untimed first: this host's
throttle oscillates on a minutes scale, so grouping by leg (all
overheads, then all bases...) lets a throttle spike land entirely on
one leg class and invert the fit (observed: overhead legs > base legs
in one grouped run).

Usage: python tools/bench_dedup_scaling.py [sf_dir] [n_copies] [base_copies]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH", "dedup_scaling.jsonl")

_CIPHER_SRC = "etaoinshrd"
_FLOOD_TEXT = " ".join(f"boiler plate footer token{i}" for i in range(15))


def docs_leg(spark, sf_dir: str, n_copies: int):
    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    legs = []
    for i in range(n_copies):
        dst = _CIPHER_SRC[i:] + _CIPHER_SRC[:i]
        c = base.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.translate("text", _CIPHER_SRC, dst).alias("text"))
        legs.append(c)
    out = legs[0]
    for c in legs[1:]:
        out = out.unionByName(c)
    # bucket flood: every 50th doc shares one base text + unique tail
    return out.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(50)) == 0,
               F.concat(F.lit(_FLOOD_TEXT + " tail"),
                        F.col("doc_id").cast("string")))
        .otherwise(F.col("text")))


def emb_leg(spark, sf_dir: str, n_copies: int):
    base = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding"))
    def make_flip(i):
        def flip(v, j):
            sign = (F.lit(1.0) - F.lit(2.0)
                    * (F.cos(F.lit(float(i * 31 + 1))
                             * (j + 1).cast("double") * F.lit(7.0))
                       < 0).cast("double"))
            return (v.cast("double") * sign).cast("float")
        return flip

    legs = []
    for i in range(n_copies):
        c = base.select(
            (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
            F.transform("embedding", make_flip(i)).alias("embedding"))
        legs.append(c)
    out = legs[0]
    for c in legs[1:]:
        out = out.unionByName(c)
    flood = spark.range(300).select(
        (F.col("id") + 900_000_000).alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)),
                    lambda j: (j.cast("double")
                               * (F.col("id") + 1).cast("double"))
                    .cast("float")).alias("embedding"))
    return out.unionByName(flood)


def timed(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    base_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from bench import cpu_calibration
    from log_parser_spark.engine.session import get_spark
    from log_parser_spark.ops import dedup

    spark = get_spark(app_name="dedup_scaling", cores=32,
                      shuffle_partitions=32)

    def ops_for(docs, emb):
        mh, mh_drops = dedup.minhash_lsh_pairs(
            docs, max_bucket_size=64, with_drop_stats=True)
        sh, sh_drops = dedup.simhash_pairs(
            docs, max_bucket_size=64, with_drop_stats=True)
        co, co_drops = dedup.embedding_cosine_dedup(
            emb, max_bucket_size=64, with_drop_stats=True)
        return {"minhash": (mh, mh_drops), "simhash": (sh, sh_drops),
                "cosine": (co, co_drops)}

    # build all three corpora up front; "overhead" = identical plans
    # over a ~256-row slice, so its wall time is the fixed per-job
    # Spark cost, measured, not guessed
    corpora = {}
    for tag, copies in (("overhead", 1), ("base", base_copies),
                        ("x10", n_copies)):
        docs = docs_leg(spark, sf_dir, copies)
        emb = emb_leg(spark, sf_dir, copies)
        if tag == "overhead":
            docs = docs.filter(F.pmod("doc_id", F.lit(97)) == 0)
            emb = emb.filter(F.pmod("vec_id", F.lit(97)) == 0)
        corpora[tag] = (docs, emb, copies, docs.count(), emb.count())

    results = []
    for op in ("minhash", "simhash", "cosine"):
        # warm this op's plan shape untimed (codegen compiles once per
        # plan shape; an unwarmed overhead leg would time compilation)
        warm_docs, warm_emb = corpora["overhead"][:2]
        timed(ops_for(warm_docs, warm_emb)[op][0])
        for tag in ("overhead", "base", "x10"):
            docs, emb, copies, n_docs, n_vecs = corpora[tag]
            pairs, drops = ops_for(docs, emb)[op]
            calib = cpu_calibration()
            legs = [timed(pairs), timed(pairs)]
            n_drop = drops.count() if tag != "overhead" else 0
            row = {"op": op, "leg": tag, "copies": copies,
                   "n_docs": n_docs if op != "cosine" else n_vecs,
                   "wall_sec": min(legs), "legs": legs,
                   "n_dropped_buckets": n_drop, "calib_sec": calib}
            print(json.dumps(row))
            results.append(row)

    summary = {"summary": True, "sf_dir": sf_dir, "slopes_raw": {},
               "slopes": {}, "overhead_sec": {}}
    for op in ("minhash", "simhash", "cosine"):
        oh = next(r for r in results
                  if r["op"] == op and r["leg"] == "overhead")
        a = next(r for r in results if r["op"] == op and r["leg"] == "base")
        b = next(r for r in results if r["op"] == op and r["leg"] == "x10")
        raw = (math.log(b["wall_sec"] / a["wall_sec"])
               / math.log(b["n_docs"] / a["n_docs"]))
        # compute slope: subtract the measured fixed overhead from both
        # legs; floor at 0.05 s so a noise-negative base can't blow up
        # the log.  The base leg must clear its own overhead by 2x or
        # the probe refuses to certify (the flattening ADVICE warned of)
        ca = max(a["wall_sec"] - oh["wall_sec"], 0.05)
        cb = max(b["wall_sec"] - oh["wall_sec"], 0.05)
        comp = math.log(cb / ca) / math.log(b["n_docs"] / a["n_docs"])
        summary["slopes_raw"][op] = round(raw, 3)
        summary["slopes"][op] = round(comp, 3)
        summary["overhead_sec"][op] = oh["wall_sec"]
        summary.setdefault("base_compute_ok", {})[op] = \
            a["wall_sec"] >= 2 * oh["wall_sec"]
        assert b["n_dropped_buckets"] > 0, \
            f"{op}: flood did not trip the bucket cap — probe invalid"
    summary["gate"] = "compute slope < 1.3"
    summary["pass"] = all(s < 1.3 for s in summary["slopes"].values())
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
