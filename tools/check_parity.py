"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on a local SparkSession and, where an
``oracle_sql()`` twin exists, the DuckDB SQL over the same parquet files;
compares row count, sorted column names, and the order-insensitive value
multiset (floats normalized).  Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from analytics.common import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round() in-query on both sides, so identical doubles are
        # expected; 10 sig digits only forgives true last-ulp noise.  The
        # "f:" marker keeps float 3.0 distinct from int 3 — the driver's
        # typed value-hash distinguishes them too (r01 x_math lesson).
        return f"f:{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(str(norm_cell(r[i])) for i in order) for r in rows
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from engine.session import build_session

    spark = build_session(app_name="parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, oracles = se.queries(), se.oracle_sql()
    failed, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            sdata = df.collect()
            scols = df.columns
        except Exception as e:  # noqa: BLE001
            failed.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"ok    {name}: rows-only, {len(sdata)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            ddata = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failed.append((name, f"cols {sorted(scols)} != {sorted(dcols)}"))
            print(f"FAIL  {name}: column mismatch {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(sdata) != len(ddata):
            failed.append((name, f"rows {len(sdata)} != {len(ddata)}"))
            print(f"FAIL  {name}: row count {len(sdata)} != {len(ddata)}")
            continue
        s_n = normalize([tuple(r) for r in sdata], scols)
        d_n = normalize(ddata, dcols)
        if s_n != d_n:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(s_n, d_n)) if a != b)
            failed.append((name, f"values differ, first at {diff}"))
            print(f"FAIL  {name}: value mismatch; first diff {diff[1]} vs {diff[2]}")
            continue
        passed += 1
        print(f"PASS  {name}: {len(sdata)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n== {passed} oracle-pass, {rows_only} rows-only, {len(failed)} failed =="
    )
    for name, why in failed:
        print(f"  FAILED {name}: {why}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
