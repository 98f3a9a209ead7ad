"""Replicates the driver's correctness gate locally: runs every
queries() entry and compares against oracle_sql() via DuckDB
(row count + column names + order-insensitive exact values).

Usage: python tools/selfcheck.py [sf_dir] [query ...]

Default sf_dir is sf0.01 — the scale the driver runs the gate at; the
golden-parquet oracles are PINNED to sf0.01 outputs.  For another sf
dir, the golden reads are redirected to the matching
data/golden_<tag>/ set when `tools/stage_golden.py <sf_dir>` has
staged one (sf-robustness check); without a staged set the
golden-backed queries will (correctly) mismatch.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from log_parser_spark.engine.session import get_spark

    spark = get_spark(app_name="selfcheck", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oq = entrymod.queries(), entrymod.oracle_sql()

    from tools.stage_golden import SF_DIR as DEFAULT_SF
    from tools.stage_golden import golden_dir_for
    if sf_dir.rstrip("/") != DEFAULT_SF:
        alt = golden_dir_for(sf_dir)
        if os.path.isdir(alt):
            from log_parser_spark.datafiles import data_path
            pinned = data_path("golden")
            oq = {n: sql.replace(pinned, alt) for n, sql in oq.items()}
            print(f"golden oracles redirected to {alt}")
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oq:
            print(f"ok    {name}: rows-only, {len(sdf)} rows")
            if len(sdf) == 0 and not name.startswith("log_"):
                failures.append((name, "0 rows"))
            continue
        try:
            odf = con.execute(oq[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            continue

        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append((name, f"cols {list(s.columns)} vs {list(o.columns)}"))
            print(f"FAIL  {name}: column mismatch\n  spark {list(s.columns)}\n  duck  {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append((name, f"rows {len(s)} vs {len(o)}"))
            print(f"FAIL  {name}: row count {len(s)} vs {len(o)}")
            continue
        # exact value compare. The driver hashes TYPED values, so a
        # dtype-kind mismatch (e.g. DuckDB HUGEINT->object/float vs
        # Spark BIGINT->int64) is a failure even when str() matches.
        mismatch = None
        for c in s.columns:
            a, b = s[c], o[c]
            ka, kb = a.dtype.kind, b.dtype.kind
            if ka != kb and not ({ka, kb} <= {"i", "u"}):
                mismatch = (f"col {c} dtype kind {a.dtype}({ka}) vs "
                            f"{b.dtype}({kb}) — driver hash would differ")
                break
            try:
                if pd.api.types.is_float_dtype(a) or \
                        pd.api.types.is_float_dtype(b):
                    ok = (a.astype(float).fillna(-9e99)
                          == b.astype(float).fillna(-9e99)).all()
                else:
                    ok = (a.astype(str) == b.astype(str)).all()
            except Exception as e:
                ok = False
                mismatch = f"{c}: compare error {e}"
            if not ok:
                if mismatch is None:
                    bad = (a.astype(str) != b.astype(str))
                    i = bad.idxmax()
                    mismatch = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"
                break
        if mismatch:
            failures.append((name, mismatch))
            print(f"FAIL  {name}: {mismatch}")
        else:
            print(f"ok    {name}: {len(s)} rows match oracle")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, m in failures:
            print(f"  {n}: {m}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
