"""Local replica of the grading driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or --sf-dir), runs the
matching oracle_sql() in DuckDB over pre-registered views, and compares:
row count, sorted column names, and order-insensitive values (floats rounded
to 6dp before comparison). Usage:

    python tools/driver_check.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Type-strict canonical form. The grading driver hashes type+repr, so
    int 31 vs float 31.0 (e.g. DuckDB HUGEINT surfacing as float64) MUST
    mismatch here too — tag numerics with their kind instead of relying on
    Python ==, which treats 31 == 31.0."""
    if v is None:
        return None
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 6))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from sparkbm25.session import get_spark

    spark = get_spark("driver-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oq = e.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        df = qs[name](spark, args.sf_dir)
        cols = sorted(df.columns)
        rows = df.select(*cols).collect()
        got = sorted(tuple(canon(v) for v in r) for r in rows)
        dt = time.time() - t0
        if name not in oq:
            print(f"  {name}: rows={len(got)} (rows-only check, no oracle) [{dt:.1f}s]")
            continue
        ores = con.sql(oq[name])
        ocols = sorted(ores.columns)
        odata = ores.df()[ocols].itertuples(index=False, name=None)
        want = sorted(tuple(canon(v) for v in r) for r in odata)
        status = "OK"
        if cols != ocols:
            status = f"SCHEMA MISMATCH spark={cols} duck={ocols}"
        elif len(got) != len(want):
            status = f"ROWCOUNT MISMATCH spark={len(got)} duck={len(want)}"
        elif got != want:
            diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
            status = f"VALUE MISMATCH first-diffs={diffs}"
        if status != "OK":
            failures += 1
        print(f"  {name}: rows={len(got)} {status} [{dt:.1f}s]")
    spark.stop()
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({len(names) - failures}/{len(names)})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
